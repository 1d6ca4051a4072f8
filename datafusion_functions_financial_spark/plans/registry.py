"""Aggregated registry of all declared query/oracle pairs.

Each entry maps a query name to ``(spark_fn, oracle_sql_or_None)``.
``__spark_entry__.py`` re-exports this for the driver; the test suite
runs every pair against DuckDB at sf0.001 so the driver's sf0.01 gate
is pre-validated locally.
"""

from __future__ import annotations

from . import analytics, indicator_queries, signals, validate
from ..functions import resample, rollstats
from ..operators import (
    asof, bm25, boilerplate, decontam, dedup, divergence, incremental,
    ivf, microstructure, multimodal, packing, pipeline, quantize, rollup,
    sampling, similarity, sketch, skew, text, tfidf,
)

_MODULES = [indicator_queries, signals, validate, analytics, text, dedup,
            similarity, asof, ivf, pipeline, sampling, microstructure, skew,
            multimodal, rollup, decontam, incremental, tfidf, sketch,
            quantize, rollstats, boilerplate, bm25, packing, resample,
            divergence]


def _collect() -> dict:
    out: dict = {}
    for m in _MODULES:
        for name, pair in m.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = pair
    return out


def all_queries() -> dict:
    return {name: fn for name, (fn, _sql) in _collect().items()}


def all_oracles() -> dict:
    return {
        name: sql for name, (_fn, sql) in _collect().items() if sql is not None
    }
