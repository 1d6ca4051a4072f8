"""Wide SimHash fingerprints (bits parameter, Manku-style).

Default 31-bit behavior is pinned by the oracle-parity gate; these
tests cover the widened path: high bit planes derive from LCG-permuted
rehashes (token hashes only carry ~30 meaningful bits), banding stays
LOSSLESS at any width, and wider fingerprints actually populate the
high planes."""

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_width_validation(docs):
    with pytest.raises(ValueError):
        dedup.simhash(docs, bits=0)
    with pytest.raises(ValueError):
        dedup.simhash(docs, bits=63)


def test_high_bit_planes_populated(docs):
    s = dedup.simhash(docs, bits=62)
    distinct_high = (
        s.select(F.expr("shiftright(simhash, 31)").alias("hi"))
        .distinct().count()
    )
    assert distinct_high > 1  # wide planes vary, not copies/zeros
    assert s.filter("simhash < 0").count() == 0  # sign bit untouched


def test_banded_equals_allpairs_at_62_bits(docs):
    sub = docs.limit(120)
    banded = {(r.id_a, r.id_b, r.hamming) for r in dedup.simhash_pairs(
        sub, max_hamming=6, method="banded", bits=62).collect()}
    allp = {(r.id_a, r.id_b, r.hamming) for r in dedup.simhash_pairs(
        sub, max_hamming=6, method="allpairs", bits=62).collect()}
    assert banded == allp  # pigeonhole blocking stays lossless


def test_wide_fingerprint_matches_duckdb(spark, docs, sf_dir):
    """The widened expression is engine-portable too: DuckDB computes
    bit-identical 62-bit fingerprints."""
    sdf = dedup.simhash(docs.filter("doc_id < 50"), bits=62).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    sql = (
        f"WITH hashed AS ({dedup._DUCK_TOKEN_HASHES_CTE}),"
        f" lim AS (SELECT * FROM hashed WHERE doc_id < 50)\n"
        f"SELECT doc_id, {dedup._simhash_from_hashes_duck(62)} AS simhash "
        f"FROM lim"
    )
    ddf = con.execute(sql).fetchdf()
    s = dict(zip(sdf.doc_id, sdf.simhash))
    d = dict(zip(ddf.doc_id, ddf.simhash))
    assert set(s) == set(d) and len(s) == 50
    assert all(int(s[k]) == int(d[k]) for k in s)
