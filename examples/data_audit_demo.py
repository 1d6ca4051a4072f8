"""Data-audit showcase — the r04 late additions composed into the
pre-ingest audit a data-platform team runs on every drop:

1. key uniqueness + referential integrity (operators/dq.py,
   operators/diff.py)
2. Benford first-digit conformance on amounts (operators/dq.py)
3. membership pre-filter via a deterministic Bloom filter
   (operators/sketch2.py)
4. heavy-hitter token audit via a Count-Min sketch vs exact top-k
   (operators/sketch2.py)
5. corpus key-phrases via RAKE (operators/keywords.py)
6. snapshot diff between two builds (operators/diff.py)

Run: python examples/data_audit_demo.py [sf_dir]
"""

import sys
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import (
    diff as diffmod,
    dq,
    keywords,
    sketch2,
)
from datafusion_functions_financial_spark.sources.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("data-audit-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    documents = load(spark, sf_dir, "documents")

    print("=== 1. Key uniqueness + FK integrity ===")
    dq.unique_key_report(orders, ["o_orderkey"]).show()
    orphans = diffmod.fk_orphans(orders, customer, "o_custkey",
                                 "c_custkey")
    print(f"orders with no customer: {orphans.count()}")

    print("=== 2. Benford conformance on order amounts ===")
    dq.benford_report(orders, "o_totalprice", ["o_orderpriority"]) \
        .orderBy("o_orderpriority").show()

    print("=== 3. Bloom membership pre-filter ===")
    members = orders.select("o_custkey").distinct()
    bloom = sketch2.bloom_build(members, "o_custkey")
    probed = sketch2.bloom_membership(
        bloom, customer.select("c_custkey"), "c_custkey")
    hits = probed.filter("in_bloom").count()
    print(f"customers passing the bloom pre-filter: {hits} "
          f"(word table rows: {bloom.count()})")

    print("=== 4. Count-Min heavy hitters vs exact ===")
    toks = documents.selectExpr(
        "explode(split(trim(lower(text)), '\\\\s+')) AS token"
    ).filter("token != ''")
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    from datafusion_functions_financial_spark.operators.text import (
        poly_hash_spark,
    )
    hashed = vocab.selectExpr("token", "exact_n",
                              f"{poly_hash_spark('token')} AS x")
    cms = sketch2.cms_build(hashed, "x", "exact_n")
    top = hashed.orderBy(F.desc("exact_n"), "token").limit(5)
    sketch2.cms_estimate(cms, top, "x") \
        .orderBy(F.desc("exact_n")).show()

    print("=== 5. RAKE corpus key-phrases ===")
    keywords.rake_keywords(documents, k=5).show(truncate=60)

    print("=== 6. Snapshot diff (old build vs new build) ===")
    old = orders.filter("o_orderkey % 5 != 0")
    new = orders.filter("o_orderkey % 7 != 0")
    d = diffmod.snapshot_diff(old, new, ["o_orderkey"],
                              ["o_custkey", "o_orderstatus"])
    d.groupBy("status").count().orderBy("status").show()

    spark.stop()


if __name__ == "__main__":
    main()
