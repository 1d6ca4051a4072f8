"""Persisted IVF index: cells written partitioned by cell_id must
serve probes via partition pruning (only probed cells' files read),
and produce results identical to the in-memory index."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import ivf
from datafusion_functions_financial_spark.operators.similarity import (
    N_QUERIES,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(
        (r.q_id, r.n_id, r.rank, round(r.cos_sim, 6))
        for r in df.collect()
    )


@pytest.mark.slow
def test_persisted_index_matches_inmemory(spark, emb, tmp_path):
    index = ivf.ivf_index(emb)
    ivf.save_index(index, str(tmp_path / "ivfidx"))
    loaded = ivf.load_index(spark, str(tmp_path / "ivfidx"))
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    a = _rows(ivf.cosine_topk_ivf(emb, qs, index=index))
    b = _rows(ivf.cosine_topk_ivf(emb, qs, index=loaded))
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_probe_scan_prunes_partitions(spark, emb, tmp_path):
    index = ivf.ivf_index(emb)
    ivf.save_index(index, str(tmp_path / "ivfidx2"))
    cents, cells = ivf.load_index(spark, str(tmp_path / "ivfidx2"))
    # A static probe (explicit cell list) must be satisfied from
    # partition directories alone: PartitionFilters carries cell_id
    # and the scan reads no non-probed files.
    some = [r.cell_id for r in cents.limit(2).collect()]
    probe = cells.filter(F.col("cell_id").isin(some))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan.split(
        "PartitionFilters", 1)[1][:200], plan
    n_total = cells.select("cell_id").distinct().count()
    assert probe.select("cell_id").distinct().count() == 2 < n_total
