"""Validator API tests on Polygon-schema data with injected violations
(FIXTURES.md F6 generation requirements)."""

import pytest

from datafusion_functions_financial_spark.plans.validate import (
    NS_MINUTE,
    ValidationReport,
    validate_day_aggs,
    validate_minute_aggs,
)
from datafusion_functions_financial_spark.sources.schemas import (
    DAY_AGGS,
    MINUTE_AGGS,
)


def minute_rows():
    base = 1_700_000_000_000_000_000
    rows = []
    # Clean consecutive minutes for two tickers.
    for t_idx, ticker in enumerate(["AAA", "BBB"]):
        for i in range(60):
            ts = base + i * NS_MINUTE + t_idx  # offset avoids global ties
            rows.append((ticker, ts, 10.0, 11.0, 9.0, 10.5, 1000))
    # One 5-minute gap.
    rows.append(("AAA", base + 66 * NS_MINUTE, 10.0, 11.0, 9.0, 10.5, 1000))
    # Violations: negative volume; non-positive open; OHLC logic error.
    rows.append(("AAA", base + 67 * NS_MINUTE, 10.0, 11.0, 9.0, 10.5, -5))
    rows.append(("AAA", base + 68 * NS_MINUTE, 0.0, 11.0, 9.0, 10.5, 1000))
    rows.append(("AAA", base + 69 * NS_MINUTE, 10.0, 8.0, 9.0, 10.5, 1000))
    return rows


def test_validate_minute_aggs(spark):
    df = spark.createDataFrame(minute_rows(), MINUTE_AGGS)
    report = validate_minute_aggs(df, ts_col="window_start")
    assert report.total_rows == 124
    # negative volume + open<=0 = 2 value violations
    assert report.checks["Negative Values"] == 2
    # high<low row, plus the open=0 row also trips low>open -> 2 rows
    assert report.checks["Logic Errors"] == 2
    assert report.checks["Time Gaps"] == 1  # the 5-minute jump
    assert not report.passed
    assert "FAILED" in report.summary()


def test_validate_minute_aggs_clean(spark):
    clean = [r for r in minute_rows()[:120]]
    df = spark.createDataFrame(clean, MINUTE_AGGS)
    report = validate_minute_aggs(df)
    assert report.passed
    assert "PASSED" in report.summary()


def test_validate_day_aggs_weekend(spark):
    import datetime as dt

    rows = [
        # 2023-01-16 is a Monday; 2023-01-14/15 are Sat/Sun.
        ("BTC", dt.date(2023, 1, 16), 1.0, 2.0, 0.5, 1.5, 10, 1.2, 3),
        ("BTC", dt.date(2023, 1, 14), 1.0, 2.0, 0.5, 1.5, 10, 1.2, 3),
        ("BTC", dt.date(2023, 1, 15), 1.0, 2.0, 0.5, 1.5, 10, 1.2, 3),
    ]
    df = spark.createDataFrame(rows, DAY_AGGS)
    report = validate_day_aggs(df)
    assert report.total_rows == 3
    assert report.checks["Weekend Data"] == 2
    assert not report.passed


def test_report_accumulates():
    r = ValidationReport()
    r.set_total_rows(10)
    r.add_check("A", 0)
    assert r.passed
    r.add_check("B", 3)
    assert not r.passed
    assert "B: 3 failures" in r.summary()
