"""End-to-end training-data curation showcase (beyond-reference
pipeline operators over the synthetic documents/embeddings tables):

1. composed curation pipeline — language ID -> quality scoring ->
   exact dedup -> MinHash-LSH near-dup clusters (operators/pipeline.py)
2. wide-SimHash near-dup pairs (62-bit fingerprints, lossless banding)
3. IVF approximate nearest neighbor over the embedding column

Run: python examples/corpus_curation.py [sf_dir]
"""

import sys
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import (
    dedup,
    ivf,
    pipeline,
)
from datafusion_functions_financial_spark.sources.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("corpus-curation")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    print("=== composed curation pipeline ===")
    cleaned = pipeline.clean_corpus(docs, max_bucket_size=1000).cache()
    total = docs.count()
    survivors = cleaned.count()
    canonical = cleaned.filter("is_kept").count()
    print(f"documents: {total} -> filtered+exact-deduped: {survivors} "
          f"-> near-dup canonical: {canonical}")
    cleaned.orderBy("doc_id").show(5)

    print("=== wide SimHash near-dup pairs (62-bit, banded) ===")
    pairs = dedup.simhash_pairs(docs, max_hamming=6, bits=62)
    pairs.orderBy("id_a", "id_b").show(5)

    print("=== IVF ANN: top-3 neighbors for 3 query vectors ===")
    queries = emb.filter(F.col("vec_id") < 3)
    ivf.cosine_topk_ivf(emb, queries, k=3).orderBy("q_id", "rank").show()

    spark.stop()


if __name__ == "__main__":
    main()
