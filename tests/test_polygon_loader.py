"""Loader tests (A15-A20, A24) against generated local flat files."""

import gzip
import os

import pytest

from datafusion_functions_financial_spark.sources.polygon import (
    ASSET_CLASSES,
    DATA_TYPES,
    DISCOVERY_CAP,
    PolygonClient,
    PolygonConfig,
)

DAY_CSV = """ticker,date,open,high,low,close,volume,vwap,transactions
BTC,2023-01-15,21000.50,21500.75,20800.25,21350.00,1500000,21300.25,12500
ETH,2023-01-15,1550.25,1580.50,1540.00,1575.75,800000,1565.50,8500
LTC,2023-01-15,85.50,87.25,84.75,86.50,150000,86.00,2500
ADA,2023-01-15,0.35,0.37,0.34,0.36,2000000,0.355,15000
DOT,2023-01-15,6.25,6.45,6.15,6.35,300000,6.30,3500
"""


@pytest.fixture()
def flatfile_root(tmp_path):
    d = tmp_path / "global_crypto" / "day_aggs_v1" / "2023"
    d.mkdir(parents=True)
    with gzip.open(d / "2023-01-15.csv.gz", "wt") as f:
        f.write(DAY_CSV)
    # plain .csv variant for the .gz->csv local fallback
    d2 = tmp_path / "us_stocks_sip" / "day_aggs_v1" / "2023"
    d2.mkdir(parents=True)
    (d2 / "2023-01-16.csv").write_text(DAY_CSV)
    return str(tmp_path)


def test_config_env(monkeypatch):
    monkeypatch.setenv("POLYGON_ACCESS_KEY_ID", "ak")
    monkeypatch.setenv("POLYGON_SECRET_ACCESS_KEY", "sk")
    monkeypatch.delenv("POLYGON_S3_ENDPOINT", raising=False)
    cfg = PolygonConfig.from_env()
    assert cfg.access_key == "ak" and cfg.secret_key == "sk"
    assert cfg.endpoint == "https://files.polygon.io"
    assert cfg.bucket == "flatfiles"


def test_config_dotenv_file(monkeypatch, tmp_path):
    """Reference parity (config.rs:24 loads .env before the env read):
    file-sourced vars fill missing keys, real env vars win, quotes
    strip, comments skip, and a missing file is fine."""
    for k in ("POLYGON_ACCESS_KEY_ID", "POLYGON_SECRET_ACCESS_KEY",
              "POLYGON_S3_ENDPOINT", "POLYGON_S3_BUCKET"):
        monkeypatch.delenv(k, raising=False)
    env = tmp_path / ".env"
    env.write_text(
        "# Polygon.io S3 Credentials\n"
        "POLYGON_ACCESS_KEY_ID=file_ak\n"
        "POLYGON_SECRET_ACCESS_KEY='file_sk'\n"
        'POLYGON_S3_BUCKET="filebucket"\n'
        "\nnot a kv line\n"
    )
    cfg = PolygonConfig.from_env(dotenv_path=str(env))
    assert cfg.access_key == "file_ak"
    assert cfg.secret_key == "file_sk"          # quotes stripped
    assert cfg.bucket == "filebucket"
    assert cfg.endpoint == "https://files.polygon.io"  # default kept
    # process env beats the file (dotenv-rs semantics)
    monkeypatch.setenv("POLYGON_ACCESS_KEY_ID", "env_ak")
    assert PolygonConfig.from_env(
        dotenv_path=str(env)).access_key == "env_ak"
    # missing file: env/defaults only, no error
    cfg2 = PolygonConfig.from_env(
        dotenv_path=str(tmp_path / "absent.env"))
    assert cfg2.access_key == "env_ak" and cfg2.bucket == "flatfiles"


def test_path_construction(spark):
    client = PolygonClient(spark, PolygonConfig.demo(), local_root="/data")
    p = client.build_path("global_crypto", "day_aggs_v1", "2023-01-15")
    assert p == "/data/global_crypto/day_aggs_v1/2023/2023-01-15.csv.gz"
    with pytest.raises(ValueError):
        client.build_path("bogus", "day_aggs_v1", "2023-01-15")
    with pytest.raises(ValueError):
        client.build_path("futures", "bogus", "2023-01-15")
    assert set(ASSET_CLASSES) == {
        "us_stocks", "us_options", "futures", "indices", "forex",
        "global_crypto",
    }
    assert len(DATA_TYPES) == 5


def test_load_gzip_day_aggs(spark, flatfile_root):
    client = PolygonClient(spark, PolygonConfig.demo(),
                           local_root=flatfile_root)
    df = client.load_crypto_day_aggs("2023-01-15")
    rows = {r["ticker"]: r for r in df.collect()}
    assert len(rows) == 5
    assert rows["BTC"]["close"] == 21350.00
    assert rows["ADA"]["volume"] == 2000000
    assert str(rows["BTC"]["date"]) == "2023-01-15"


def test_ticker_filter_pushdown(spark, flatfile_root):
    client = PolygonClient(spark, PolygonConfig.demo(),
                           local_root=flatfile_root)
    df = client.load_data("global_crypto", "day_aggs_v1", "2023-01-15",
                          symbol="ETH")
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["ticker"] == "ETH"
    # The equality predicate must reach the scan.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ticker" in plan


def test_local_gz_to_csv_fallback(spark, flatfile_root):
    client = PolygonClient(spark, PolygonConfig.demo(),
                           local_root=flatfile_root)
    df = client.load_day_aggs("BTC", "2023-01-16")  # only .csv exists
    assert df.count() == 1


def test_discovery(spark, flatfile_root):
    client = PolygonClient(spark, PolygonConfig.demo(),
                           local_root=flatfile_root)
    files = client.list_available_files()
    assert 0 < len(files) <= DISCOVERY_CAP
    assert set(client.discover_asset_classes()) == {
        "global_crypto", "us_stocks_sip",
    }
    assert client.discover_data_types("global_crypto") == ["day_aggs_v1"]


def test_register_with_indicators(spark, flatfile_root):
    from datafusion_functions_financial_spark.functions import indicators as ind

    client = PolygonClient(spark, PolygonConfig.demo(),
                           local_root=flatfile_root)
    df = client.load_crypto_day_aggs("2023-01-15")
    client.register_table_with_indicators("crypto_day_aggs", df)
    assert spark.sql("SELECT count(*) c FROM crypto_day_aggs").collect()[0][
        "c"] == 5
    # Indicator over the registered table via the DataFrame surface.
    out = ind.with_indicators(
        spark.table("crypto_day_aggs"), "close", ["date"], ["ticker"],
        [ind.sma(1)],
    )
    assert out.filter("sma_1 = close").count() == 5


def test_remote_listing_via_hadoop_fs(spark, flatfile_root):
    # Exercises the REAL remote-listing code path (Hadoop FileSystem
    # stream + cap) through the file:// scheme — same JVM machinery
    # s3a:// uses, no credentials needed.
    client = PolygonClient(spark, PolygonConfig.demo(), local_root="/x")
    files = client._list_hadoop(f"file://{flatfile_root}")
    assert len(files) == 2
    assert any(f.endswith("2023-01-15.csv.gz") for f in files)
    assert all(f.startswith("file:") for f in files)


def test_remote_listing_cap(spark, tmp_path):
    d = tmp_path / "us_stocks_sip" / "trades_v1" / "2023"
    d.mkdir(parents=True)
    for i in range(DISCOVERY_CAP + 15):
        (d / f"2023-02-{i:02d}.csv").write_text("ticker\nX\n")
    client = PolygonClient(spark, PolygonConfig.demo(), local_root="/x")
    files = client._list_hadoop(f"file://{tmp_path}")
    assert len(files) == DISCOVERY_CAP  # client.rs:173-176 cap parity


def test_s3_discovery_with_injected_lister(spark):
    # S3-configured client (no local_root): discovery must work through
    # the lister without NotImplementedError (A19).
    keys = [
        "s3a://flatfiles/us_stocks_sip/minute_aggs_v1/2024/2024-01-02.csv.gz",
        "s3a://flatfiles/us_stocks_sip/trades_v1/2024/2024-01-02.csv.gz",
        "s3a://flatfiles/global_crypto/day_aggs_v1/2024/2024-01-02.csv.gz",
    ]
    client = PolygonClient(
        spark, PolygonConfig.demo(),
        lister=lambda base: [k for k in keys if k.startswith(base)],
    )
    assert set(client.discover_asset_classes()) == {
        "us_stocks_sip", "global_crypto"
    }
    assert set(client.discover_data_types("us_stocks_sip")) == {
        "minute_aggs_v1", "trades_v1"
    }


def test_injected_lister_cap(spark):
    many = [f"s3a://flatfiles/us_stocks_sip/f{i}.csv" for i in range(50)]
    client = PolygonClient(spark, PolygonConfig.demo(),
                           lister=lambda base: many)
    assert len(client.list_available_files()) == DISCOVERY_CAP
