"""Training-data preparation showcase — the r03 operator additions
composed into the flow an LLM data pipeline actually runs:

1. percentile quality gate per source (operators/quality.py)
2. benchmark decontamination (operators/decontam.py)
3. overlapping token chunking (operators/chunking.py)
4. greedy sequence packing of the chunks (operators/packing.py)
5. corpus profile: vocabulary stats + doc-length histogram + CDF

Run: python examples/training_data_prep.py [sf_dir]
"""

import sys
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from datafusion_functions_financial_spark.operators import (
    chunking,
    decontam,
    histogram,
    quality,
    vocab,
)
from datafusion_functions_financial_spark.sources.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("training-data-prep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    docs = load(spark, sf_dir, "documents")

    # 1. keep docs at or above their source's p25 length
    kept = quality.percentile_filter(docs, "n_chars", "source", q=0.25)
    print(f"quality gate: {docs.count()} -> {kept.count()} docs")

    # 2. drop docs sharing 3-grams with a held-out benchmark slice
    bench = kept.filter("doc_id % 37 = 0")
    train = decontam.decontaminate(kept.filter("doc_id % 37 != 0"),
                                   bench, n=3)
    print(f"decontamination: -> {train.count()} clean docs")

    # 3. chunk into overlapping token windows
    chunks = chunking.chunk_documents(train, chunk_tokens=32, stride=24)
    print(f"chunking: {chunks.count()} chunks")

    # 4. corpus profile
    stats = vocab.vocab_stats(train).first()
    print(f"vocab: {stats['n_tokens']} tokens, "
          f"{stats['n_distinct']} distinct, "
          f"TTR {stats['type_token_ratio']}, "
          f"head share {stats['top_token_share']}")
    hist = histogram.int_histogram(train, "n_chars", 50)
    cdf = histogram.histogram_cdf(
        hist.select("bin", "n_rows"))
    print("doc-length CDF (bin width 50 chars):")
    for r in cdf.orderBy("bin").collect():
        print(f"  bin {r['bin']:>3}: {r['n_rows']:>5} docs  "
              f"cdf={r['cdf']:.4f}")

    spark.stop()


if __name__ == "__main__":
    main()
