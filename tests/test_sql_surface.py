"""The reference's SQL strings, run through sql_with_indicators."""

import math

import pytest

from datafusion_functions_financial_spark.functions.sql import (
    register,
    sql_with_indicators,
)


@pytest.fixture()
def prices_view(spark):
    rows = [(float(i),) for i in range(1, 11)]
    spark.createDataFrame(rows, "price double").withColumn(
        "seq", __import__("pyspark.sql.functions", fromlist=["F"]).expr(
            "CAST(price AS BIGINT)")
    ).createOrReplaceTempView("prices")
    return "prices"


@pytest.fixture()
def series_view(spark, sf_dir):
    from datafusion_functions_financial_spark.sources.tables import load

    load(spark, sf_dir, "events").createOrReplaceTempView("minute_aggs")
    return "minute_aggs"


def test_reference_quickstart_sql(spark, prices_view):
    # README.md:84-94 shape: indicator OVER (ORDER BY ...).
    out = sql_with_indicators(spark, """
        SELECT price,
               sma(price, 3) OVER (ORDER BY seq) AS sma_3,
               ema(price, 3) OVER (ORDER BY seq) AS ema_3
        FROM prices
        ORDER BY seq
    """).collect()
    assert [r["sma_3"] for r in out[:4]] == [None, None, 2.0, 3.0]
    assert out[0]["ema_3"] == 1.0  # first-value seed


def test_reference_over_unordered_sql(spark, prices_view):
    # src/functions/sma.rs:156 uses OVER () — input order.
    out = sql_with_indicators(
        spark,
        "SELECT price, sma(price, 3) OVER () AS sma_3 FROM prices",
    ).collect()
    got = {r["price"]: r["sma_3"] for r in out}
    assert got[10.0] == pytest.approx(9.0)


def test_reference_rsi_signals_sql(spark, series_view):
    # signals.rs:36-47 verbatim shape incl. window-fn-in-WHERE (rewritten
    # to a plain column reference by the preprocessor).
    out = sql_with_indicators(spark, """
        SELECT
            user_id,
            ts,
            value,
            rsi(value, 14) OVER (PARTITION BY user_id ORDER BY ts, event_id) as rsi_14
        FROM minute_aggs
        WHERE rsi(value, 14) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL
        ORDER BY user_id, ts
    """)
    rows = out.collect()
    assert len(rows) > 0
    assert all(
        r["rsi_14"] is not None and not math.isnan(r["rsi_14"])
        and 0.0 <= r["rsi_14"] <= 100.0
        for r in rows
    )


def test_reference_crossover_cte_sql(spark, series_view):
    # signals.rs:102-121 verbatim shape: CTE + LAG(sma(...), 1) OVER.
    out = sql_with_indicators(spark, """
        WITH ma_data AS (
            SELECT
                user_id,
                ts,
                value,
                sma(value, 5) OVER (PARTITION BY user_id ORDER BY ts, event_id) as sma_20,
                sma(value, 10) OVER (PARTITION BY user_id ORDER BY ts, event_id) as sma_50,
                LAG(sma(value, 5), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) as prev_sma_20,
                LAG(sma(value, 10), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) as prev_sma_50
            FROM minute_aggs
        )
        SELECT *
        FROM ma_data
        WHERE sma_20 IS NOT NULL AND sma_50 IS NOT NULL
          AND prev_sma_20 IS NOT NULL AND prev_sma_50 IS NOT NULL
          AND (
            (prev_sma_20 <= prev_sma_50 AND sma_20 > sma_50) OR
            (prev_sma_20 >= prev_sma_50 AND sma_20 < sma_50)
          )
        ORDER BY user_id, ts
    """)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        crossed_up = r["prev_sma_20"] <= r["prev_sma_50"] and r["sma_20"] > r["sma_50"]
        crossed_dn = r["prev_sma_20"] >= r["prev_sma_50"] and r["sma_20"] < r["sma_50"]
        assert crossed_up or crossed_dn


def test_register_binds_convenience(spark, prices_view):
    register(spark)
    out = spark.sql_with_indicators(
        "SELECT price, macd(price) OVER (ORDER BY seq) AS m FROM prices"
    ).collect()
    assert out[0]["m"] == 0.0  # both EMAs seed on row 1


def test_plain_sql_passthrough(spark, prices_view):
    out = sql_with_indicators(spark, "SELECT count(*) c FROM prices")
    assert out.collect()[0]["c"] == 10


def test_over_order_by_asc_suffix(spark, prices_view):
    # Redundant ASC must parse as the bare column.
    out = sql_with_indicators(spark, """
        SELECT price, sma(price, 3) OVER (ORDER BY seq ASC) AS sma_3
        FROM prices ORDER BY seq
    """).collect()
    assert [r["sma_3"] for r in out[:4]] == [None, None, 2.0, 3.0]


def test_over_order_by_desc_rejected_eagerly(spark, prices_view):
    with pytest.raises(ValueError, match="DESC"):
        sql_with_indicators(spark, """
            SELECT sma(price, 3) OVER (ORDER BY seq DESC) AS s FROM prices
        """)


def test_over_order_by_expression_rejected(spark, prices_view):
    with pytest.raises(ValueError, match="plain column"):
        sql_with_indicators(spark, """
            SELECT sma(price, 3) OVER (ORDER BY seq + 1) AS s FROM prices
        """)
