"""Polygon.io flat-file client (SURVEY §2.A A15-A20, A24).

Spark-first port of the reference's ``PolygonClient``
(``src/polygon/client.rs``) and ``PolygonConfig``
(``src/polygon/config.rs``):

- dated path construction
  ``{root}/{asset_prefix}/{data_type}/{YYYY}/{YYYY-MM-DD}.csv.gz``
  (client.rs:258-282) over six asset classes x five data types
  (types.rs:28-37, client.rs:250-256)
- CSV(.gz) scans with explicit schemas (Spark auto-decompresses .gz;
  the reference's local-mode ``.csv.gz -> .csv`` fallback is kept,
  client.rs:113-124)
- optional ticker filter pushed into the scan (client.rs:129-133)
- S3 access via Hadoop s3a configuration (client.rs:48-68)
- discovery helpers with the reference's 20-entry cap
  (client.rs:169-200) and asset-class/data-type discovery
  (client.rs:205-232)
- ``register_table_with_indicators`` (client.rs:137-149)

Env vars match the reference: POLYGON_ACCESS_KEY_ID,
POLYGON_SECRET_ACCESS_KEY, POLYGON_S3_ENDPOINT, POLYGON_S3_BUCKET.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas

ASSET_CLASSES = {
    "us_stocks": "us_stocks_sip",
    "us_options": "us_options_opra",
    "futures": "futures",
    "indices": "indices",
    "forex": "forex",
    "global_crypto": "global_crypto",
}

DATA_TYPES = (
    "minute_aggs_v1",
    "day_aggs_v1",
    "trades_v1",
    "quotes_v1",
    "grouped_daily_v1",
)

DISCOVERY_CAP = 20  # parity with client.rs:169-200


def _load_dotenv(path: str = ".env") -> dict:
    """Minimal ``.env`` parser (reference parity: config.rs:24 calls
    ``dotenv::dotenv().ok()`` before reading the environment — real
    env vars WIN over file values, and a missing file is fine). Only
    ``KEY=VALUE`` lines; ``#`` comments and blanks skipped; optional
    surrounding single/double quotes stripped. No python-dotenv
    dependency."""
    out: dict = {}
    try:
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                k, _, v = line.partition("=")
                k, v = k.strip(), v.strip()
                if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
                    v = v[1:-1]
                if k:
                    out[k] = v
    except OSError:
        pass
    return out


@dataclass
class PolygonConfig:
    """Reference config (config.rs:8-51): env-driven with demo
    fallback and optional ``.env`` file loading (config.rs:24)."""

    access_key: str = ""
    secret_key: str = ""
    endpoint: str = "https://files.polygon.io"
    bucket: str = "flatfiles"

    @classmethod
    def from_env(cls, dotenv_path: str = ".env") -> "PolygonConfig":
        fileenv = _load_dotenv(dotenv_path)

        def get(key: str, default: str = "") -> str:
            # process env wins over the .env file, matching dotenv-rs
            return os.environ.get(key, fileenv.get(key, default))

        return cls(
            access_key=get("POLYGON_ACCESS_KEY_ID"),
            secret_key=get("POLYGON_SECRET_ACCESS_KEY"),
            endpoint=get("POLYGON_S3_ENDPOINT",
                         "https://files.polygon.io"),
            bucket=get("POLYGON_S3_BUCKET", "flatfiles"),
        )

    @classmethod
    def demo(cls) -> "PolygonConfig":
        return cls(access_key="demo_access_key", secret_key="demo_secret_key")


@dataclass
class PolygonClient:
    """Loads Polygon flat files as Spark DataFrames (local FS or s3a).

    ``lister``, when provided, overrides remote listing: a callable
    taking the listing base (e.g. ``s3a://bucket/prefix``) and
    returning an iterable of paths — for tests or non-Hadoop stores.
    """

    spark: SparkSession
    config: PolygonConfig = field(default_factory=PolygonConfig.from_env)
    local_root: str | None = None  # if set, read from local FS instead of S3
    lister: object | None = None  # Callable[[str], Iterable[str]]

    def __post_init__(self) -> None:
        if self.local_root is None and self.config.access_key:
            self._configure_s3a()

    def _configure_s3a(self) -> None:
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        hconf.set("fs.s3a.endpoint", self.config.endpoint)
        hconf.set("fs.s3a.access.key", self.config.access_key)
        hconf.set("fs.s3a.secret.key", self.config.secret_key)
        hconf.set("fs.s3a.path.style.access", "true")

    # -- path construction (client.rs:243-285) -----------------------------

    def _root(self) -> str:
        if self.local_root is not None:
            return self.local_root.rstrip("/")
        return f"s3a://{self.config.bucket}"

    def build_path(self, asset_class: str, data_type: str, date: str) -> str:
        if asset_class not in ASSET_CLASSES:
            raise ValueError(
                f"unknown asset class {asset_class!r}; "
                f"expected one of {sorted(ASSET_CLASSES)}"
            )
        if data_type not in DATA_TYPES:
            raise ValueError(
                f"unknown data type {data_type!r}; expected one of "
                f"{DATA_TYPES}"
            )
        year = date.split("-")[0]
        prefix = ASSET_CLASSES[asset_class]
        return (
            f"{self._root()}/{prefix}/{data_type}/{year}/{date}.csv.gz"
        )

    # -- loading (client.rs:98-134) ----------------------------------------

    def load_data(
        self,
        asset_class: str,
        data_type: str,
        date: str,
        symbol: str | None = None,
    ) -> DataFrame:
        path = self.build_path(asset_class, data_type, date)
        if self.local_root is not None and not os.path.exists(
            path[len("file://"):] if path.startswith("file://") else path
        ):
            # Local fallback: .csv.gz -> .csv (client.rs:113-124).
            alt = path[: -len(".gz")]
            if os.path.exists(alt):
                path = alt
        schema = schemas.BY_DATA_TYPE[data_type]
        df = (
            self.spark.read.option("header", True)
            .schema(schema)
            .csv(path)  # Spark decompresses .gz transparently
        )
        if symbol is not None:
            # Pushed down into the scan by Catalyst.
            df = df.filter(F.col("ticker") == F.lit(symbol))
        return df

    def load_minute_aggs(self, symbol: str, date: str) -> DataFrame:
        return self.load_data("us_stocks", "minute_aggs_v1", date, symbol)

    def load_day_aggs(self, symbol: str, date: str) -> DataFrame:
        return self.load_data("us_stocks", "day_aggs_v1", date, symbol)

    def load_trades(self, symbol: str, date: str) -> DataFrame:
        return self.load_data("us_stocks", "trades_v1", date, symbol)

    def load_crypto_day_aggs(self, date: str) -> DataFrame:
        return self.load_data("global_crypto", "day_aggs_v1", date)

    # -- registration (client.rs:137-149) ----------------------------------

    def register_table_with_indicators(self, name: str, df: DataFrame) -> None:
        """Register ``df`` as a temp view; indicator SQL over it runs via
        ``functions.sql.sql_with_indicators`` (Spark has no SQL window
        UDFs — see that module for the rewrite strategy)."""
        df.createOrReplaceTempView(name)

    # -- discovery (client.rs:152-232) -------------------------------------

    def list_available_files(self, prefix: str = "") -> list[str]:
        root = self._root()
        base = f"{root}/{prefix.strip('/')}" if prefix else root
        if self.lister is not None:
            out = []
            for p in self.lister(base):
                out.append(p)
                if len(out) >= DISCOVERY_CAP:
                    break
            return out
        if self.local_root is None:
            return self._list_hadoop(base)
        found: list[str] = []
        for dirpath, _dirs, files in sorted(os.walk(base)):
            for f in sorted(files):
                if f.endswith((".csv", ".csv.gz")):
                    found.append(os.path.join(dirpath, f))
                    if len(found) >= DISCOVERY_CAP:
                        return found
        return found

    def _list_hadoop(self, base: str, cap: int = DISCOVERY_CAP) -> list[str]:
        """Recursive object listing through the Hadoop FileSystem API —
        the same client.rs:169-184 stream-with-cap shape, but scheme-
        agnostic (s3a://, file://, hdfs://) and using the credentials
        already placed in the Hadoop conf by ``_configure_s3a``. The
        cap bounds listing cost on huge buckets exactly like the
        reference's ``files.len() >= 20`` break."""
        sc = self.spark.sparkContext
        jvm = sc._jvm
        hconf = sc._jsc.hadoopConfiguration()
        try:
            path = jvm.org.apache.hadoop.fs.Path(base)
            fs = path.getFileSystem(hconf)
            it = fs.listFiles(path, True)
            out: list[str] = []
            while it.hasNext() and len(out) < cap:
                out.append(it.next().getPath().toString())
            return out
        except Exception as e:  # surface an actionable message
            raise RuntimeError(
                f"listing {base!r} failed: {e}. For s3a:// paths the "
                "cluster needs the hadoop-aws jars and credentials "
                "(set POLYGON_ACCESS_KEY_ID/POLYGON_SECRET_ACCESS_KEY); "
                "alternatively pass lister= for a custom object store."
            ) from e

    def discover_asset_classes(self) -> list[str]:
        files = self.list_available_files()
        root = self._root().rstrip("/") + "/"
        seen: dict[str, None] = {}
        for f in files:
            rel = f[len(root):] if f.startswith(root) else f
            parts = rel.split("/")
            if parts:
                seen.setdefault(parts[0])
        return list(seen)

    def discover_data_types(self, asset_class: str) -> list[str]:
        files = self.list_available_files(asset_class)
        seen: dict[str, None] = {}
        for f in files:
            parts = f.split("/")
            for i, p in enumerate(parts[:-1]):
                if p == asset_class and i + 1 < len(parts):
                    seen.setdefault(parts[i + 1])
        return list(seen)
