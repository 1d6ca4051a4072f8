"""Beyond-reference demo: the training-data pipeline operators over the
driver testdata (documents + embeddings)."""

import sys
sys.path.insert(0, "/root/repo")


import os

from pyspark.sql import SparkSession, functions as F

from datafusion_functions_financial_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
)
from datafusion_functions_financial_spark.operators.similarity import (
    cosine_topk,
)
from datafusion_functions_financial_spark.operators.text import (
    lang_id,
    text_stats,
)
from datafusion_functions_financial_spark.sources.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("pipeline-demo").config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = load(spark, SF_DIR, "documents")
    emb = load(spark, SF_DIR, "embeddings")

    print("Text quality stats:")
    text_stats(docs).select(
        "doc_id", "n_tokens", "quality_score").show(5)

    print("Language ID vs labels:")
    lang_id(docs).groupBy("lang", "lang_pred").count().show()

    print("Exact-dup groups with >1 doc:")
    exact_dedup_groups(docs).filter("dup_count > 1").show(5)

    print("MinHash-LSH near-duplicates (J >= 0.8):")
    minhash_lsh_pairs(docs).show(5)

    print("Top-3 neighbors of vec 0:")
    cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).show()
    spark.stop()


if __name__ == "__main__":
    main()
