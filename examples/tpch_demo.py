"""TPC-H join-plan showcase — the full classic repertoire the engine
carries (plans/analytics8/9/10), run end to end on the testdata star
schema:

1. pricing summary + shipping priority (analytics: Q1/Q3 shapes)
2. region-gated 6-way join, nation-pair shipping, market share,
   returned items, promo share, argmax supplier, correlated-quantity
   filter, HAVING-gated large orders, lapsed-accounts anti-join
   (analytics9: Q5/Q7/Q8/Q10/Q14/Q15/Q17/Q18/Q22)
3. correlated-min supplier, EXISTS late orders, profit rollup,
   important parts, late-line split, disjunctive revenue, excess
   suppliers, waiting suppliers (analytics10: Q2/Q4/Q9/Q11/Q12/
   Q19/Q20/Q21)

Run: python examples/tpch_demo.py [sf_dir]
"""

import sys
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from datafusion_functions_financial_spark.plans import (
    analytics9,
    analytics10,
)
from datafusion_functions_financial_spark.sources.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("tpch-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tables = {t: load(spark, sf_dir, t) for t in
              ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem")}

    suite = [
        ("Q5 local supplier volume",
         analytics9.local_supplier_volume(tables)),
        ("Q7 volume shipping", analytics9.volume_shipping(tables)),
        ("Q8 national market share",
         analytics9.national_market_share(tables)),
        ("Q10 returned items (top 5)",
         analytics9.returned_items(tables, k=5)),
        ("Q14 promo revenue share",
         analytics9.promo_revenue(tables)),
        ("Q15 top supplier", analytics9.top_supplier(tables)),
        ("Q17 small-quantity revenue",
         analytics9.small_qty_revenue(tables)),
        ("Q18 large-volume customers (top 5)",
         analytics9.large_volume_customers(tables, k=5)),
        ("Q22 lapsed high-balance accounts",
         analytics9.lapsed_high_balance(tables)),
        ("Q6 forecast revenue delta",
         analytics10.forecast_revenue(tables)),
        ("Q2 min-price suppliers (top 5)",
         analytics10.min_price_suppliers(tables, k=5)),
        ("Q4 priority late orders",
         analytics10.priority_late_orders(tables)),
        ("Q9 profit by nation/year (sample)",
         analytics10.profit_by_nation_year(tables).limit(5)),
        ("Q11 important parts (sample)",
         analytics10.important_parts(tables).limit(5)),
        ("Q12 late lines by status",
         analytics10.late_lines_by_status(tables)),
        ("Q19 disjunctive revenue",
         analytics10.disjunctive_revenue(tables)),
        ("Q20 excess-quantity suppliers (sample)",
         analytics10.excess_qty_suppliers(tables).limit(5)),
        ("Q21 waiting suppliers (top 5)",
         analytics10.waiting_suppliers(tables, k=5)),
    ]
    for title, df in suite:
        print(f"\n=== {title} ===")
        df.show(10, truncate=False)

    spark.stop()
    print("tpch demo: OK")


if __name__ == "__main__":
    main()
