"""TPC-H-shaped multi-join analytics, part 2 (Q5/Q7/Q8/Q10/Q14/Q15/
Q17/Q18/Q22 adaptations to the testdata star schema).

These extend ``analytics8``'s Q3/Q16 shapes to the rest of the
classic join-plan repertoire the reference's SQL surface would be
asked to run: region-gated 6-way joins, nation-pair volume shipping,
market share with a conditional numerator, returned-item top-k,
promo-share conditional aggregates, argmax-by-join (top supplier),
correlated-aggregate small-quantity filters, HAVING-gated large
orders, and an anti-join opportunity scan. Adaptations (the testdata
schema has no partsupp/shipmode/commitdate/phone): Q8 drops the
region gate on the customer side, Q17 keeps the 0.2*avg(qty)
correlated filter but reports the total, Q22 replaces "no orders
ever" (empty here — every customer has orders) with "no orders since
2000" (lapsed high-balance accounts).

Engine-exactness: every revenue sum is exact integer cents
(``round(price * (1-disc) * 100)`` per line, BIGINT sum — the
analytics8 convention); quantities are integral by construction
(asserted in the oracles' Spark twins via integer casts); ratio
outputs divide two exact BIGINTs once and round portably; every
ORDER BY ... LIMIT carries a unique key tiebreaker.

Plan shape at 100 TB: region/nation are broadcast by hint (bounded
dimensions); customer/supplier/part joins are left to Catalyst/AQE
(they scale with SF — at real scale they shuffle on their keys, and
AQE converts to broadcast when a filtered side fits). The fact
tables join on l_orderkey/o_orderkey — co-partitionable by bucketing
both on the order key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .series import round_portable, round_portable_duck

_CENTS = ("CAST(round(l_extendedprice * (1 - l_discount) * 100) "
          "AS BIGINT)")

Q5_REGION = "ASIA"
Q5_LO, Q5_HI = "1996-01-01", "1998-01-01"
Q7_N1, Q7_N2 = "NATION_3", "NATION_8"
Q7_LO, Q7_HI = "1996-01-01", "1998-01-01"
Q8_NATION = "NATION_3"
Q8_TYPE = "PROMO"
Q10_LO, Q10_HI = "1996-07-01", "1996-10-01"
Q10_TOPK = 20
Q14_LO, Q14_HI = "1996-09-01", "1996-10-01"
Q15_LO, Q15_HI = "1996-04-01", "1996-07-01"
Q17_BRAND = "Brand#12"
Q18_MIN_QTY = 300
Q18_TOPK = 10
Q22_CUTOFF = "2000-01-01"


def _rev_lines(lineitem: DataFrame) -> DataFrame:
    return lineitem.selectExpr(
        "l_orderkey", "l_suppkey", "l_partkey",
        f"{_CENTS} AS __cents")


def local_supplier_volume(spark_tables: dict,
                          region: str = Q5_REGION) -> DataFrame:
    """TPC-H Q5: revenue by nation from orders where the customer and
    the line's supplier share a nation inside ``region``."""
    c, o, li, s, n, r = (spark_tables[t] for t in
                         ("customer", "orders", "lineitem",
                          "supplier", "nation", "region"))
    nr = (n.join(F.broadcast(r.filter(F.col("r_name") == region)),
                 n.n_regionkey == r.r_regionkey)
          .select("n_nationkey", "n_name"))
    o_f = o.filter(F.expr(
        f"o_orderdate >= TIMESTAMP '{Q5_LO}' "
        f"AND o_orderdate < TIMESTAMP '{Q5_HI}'"))
    j = (
        _rev_lines(li)
        .join(o_f.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nr),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum("__cents").alias("__rev"))
        .select("n_name",
                round_portable(F.expr("__rev / 100.0"), 2)
                .alias("revenue"))
    )


def volume_shipping(spark_tables: dict, n1: str = Q7_N1,
                    n2: str = Q7_N2) -> DataFrame:
    """TPC-H Q7: revenue shipped between a nation pair by
    (supp_nation, cust_nation, year)."""
    c, o, li, s, n = (spark_tables[t] for t in
                      ("customer", "orders", "lineitem", "supplier",
                       "nation"))
    nn = n.filter(F.col("n_name").isin(n1, n2)).select(
        "n_nationkey", "n_name")
    li_f = li.filter(F.expr(
        f"l_shipdate >= TIMESTAMP '{Q7_LO}' "
        f"AND l_shipdate < TIMESTAMP '{Q7_HI}'"))
    j = (
        li_f.selectExpr("l_orderkey", "l_suppkey",
                        f"{_CENTS} AS __cents",
                        "CAST(year(l_shipdate) AS BIGINT) AS l_year")
        .join(s.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nn.selectExpr(
            "n_nationkey AS __sn_key", "n_name AS supp_nation")),
            F.col("s_nationkey") == F.col("__sn_key"))
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nn.selectExpr(
            "n_nationkey AS __cn_key", "n_name AS cust_nation")),
            F.col("c_nationkey") == F.col("__cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("__cents").alias("__rev"))
        .select("supp_nation", "cust_nation", "l_year",
                round_portable(F.expr("__rev / 100.0"), 2)
                .alias("revenue"))
    )


def national_market_share(spark_tables: dict,
                          nation: str = Q8_NATION,
                          ptype: str = Q8_TYPE) -> DataFrame:
    """TPC-H Q8 shape: per order year, ``nation``'s suppliers' share
    of all revenue on ``ptype`` parts. Share = exact-cents BIGINT
    numerator / denominator, divided once."""
    o, li, s, n, p = (spark_tables[t] for t in
                      ("orders", "lineitem", "supplier", "nation",
                       "part"))
    j = (
        _rev_lines(li)
        .join(p.filter(F.col("p_type") == ptype).select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.selectExpr("CAST(year(o_orderdate) AS BIGINT) AS o_year",
                     "__cents",
                     f"CASE WHEN n_name = '{nation}' THEN __cents "
                     "ELSE CAST(0 AS BIGINT) END AS __nat")
        .groupBy("o_year")
        .agg(F.sum("__cents").alias("__den"),
             F.sum("__nat").alias("__num"))
        .select("o_year",
                round_portable(F.expr(
                    "CAST(__num AS DOUBLE) / CAST(__den AS DOUBLE)"),
                    6).alias("mkt_share"))
    )


def returned_items(spark_tables: dict, k: int = Q10_TOPK) -> DataFrame:
    """TPC-H Q10: top-``k`` customers by revenue lost to returns in
    one quarter; ties rank by c_custkey."""
    c, o, li, n = (spark_tables[t] for t in
                   ("customer", "orders", "lineitem", "nation"))
    o_f = o.filter(F.expr(
        f"o_orderdate >= TIMESTAMP '{Q10_LO}' "
        f"AND o_orderdate < TIMESTAMP '{Q10_HI}'"))
    j = (
        li.filter(F.col("l_returnflag") == "R")
        .selectExpr("l_orderkey", f"{_CENTS} AS __cents")
        .join(o_f.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_name", "c_acctbal",
                       "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum("__cents").alias("__rev"))
    return (
        agg.orderBy(F.col("__rev").desc(), F.col("c_custkey").asc())
        .limit(k)
        .select("c_custkey", "c_name", "n_name",
                round_portable(F.expr("__rev / 100.0"), 2)
                .alias("revenue"))
    )


def promo_revenue(spark_tables: dict, ptype: str = Q8_TYPE) -> DataFrame:
    """TPC-H Q14: promo-part revenue share (percent) in one month."""
    li, p = spark_tables["lineitem"], spark_tables["part"]
    j = (
        li.filter(F.expr(
            f"l_shipdate >= TIMESTAMP '{Q14_LO}' "
            f"AND l_shipdate < TIMESTAMP '{Q14_HI}'"))
        .selectExpr("l_partkey", f"{_CENTS} AS __cents")
        .join(p.select("p_partkey", "p_type"),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        j.selectExpr(
            "__cents",
            f"CASE WHEN p_type = '{ptype}' THEN __cents "
            "ELSE CAST(0 AS BIGINT) END AS __promo")
        .agg(F.sum("__promo").alias("__num"),
             F.sum("__cents").alias("__den"))
        .select(round_portable(F.expr(
            "100.0 * CAST(__num AS DOUBLE) / CAST(__den AS DOUBLE)"),
            6).alias("promo_pct"))
    )


def top_supplier(spark_tables: dict) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarter revenue —
    argmax by join against the 1-row max (all ties returned, so the
    result set is deterministic without LIMIT)."""
    li, s = spark_tables["lineitem"], spark_tables["supplier"]
    rev = (
        li.filter(F.expr(
            f"l_shipdate >= TIMESTAMP '{Q15_LO}' "
            f"AND l_shipdate < TIMESTAMP '{Q15_HI}'"))
        .selectExpr("l_suppkey", f"{_CENTS} AS __cents")
        .groupBy("l_suppkey")
        .agg(F.sum("__cents").alias("__rev"))
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), rev.__rev == mx.__mx)
        .join(s.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                round_portable(F.expr("__rev / 100.0"), 2)
                .alias("total_revenue"))
    )


def small_qty_revenue(spark_tables: dict,
                      brand: str = Q17_BRAND) -> DataFrame:
    """TPC-H Q17 shape: revenue and line count from ``brand`` lines
    whose quantity is below 0.2x the part's average quantity. The
    correlated average compares EXACTLY: quantities are integral, so
    ``qty < 0.2 * sum/cnt`` is evaluated as ``5 * qty * cnt < sum``
    in BIGINT — no float threshold on either engine."""
    li, p = spark_tables["lineitem"], spark_tables["part"]
    bl = (
        li.selectExpr("l_partkey", "l_orderkey",
                      "CAST(l_quantity AS BIGINT) AS __qty",
                      f"{_CENTS} AS __cents")
        .join(p.filter(F.col("p_brand") == brand).select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    per_part = bl.groupBy("l_partkey").agg(
        F.sum("__qty").alias("__qsum"),
        F.count(F.lit(1)).cast("bigint").alias("__qcnt"))
    # NO broadcast hint on per_part: it is one row per distinct brand
    # part (~1/25 of the part table), which GROWS with scale factor —
    # at 100 TB it is far past broadcastable. Both sides hash-partition
    # on l_partkey (the aggregate's shuffle already produces that
    # clustering), and AQE may still choose a broadcast when the
    # filtered side measures small. Plan-asserted in
    # tests/test_analytics9.py::test_q17_no_forced_broadcast.
    return (
        bl.join(per_part.withColumnRenamed("l_partkey", "__pk"),
                F.col("l_partkey") == F.col("__pk"))
        .filter(F.expr("5 * __qty * __qcnt < __qsum"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
             F.sum("__cents").alias("__rev"))
        .select("n_lines",
                round_portable(F.expr("coalesce(__rev, 0) / 100.0"),
                               2).alias("revenue"))
    )


def large_volume_customers(spark_tables: dict,
                           min_qty: int = Q18_MIN_QTY,
                           k: int = Q18_TOPK) -> DataFrame:
    """TPC-H Q18: top-``k`` orders by total quantity above
    ``min_qty`` (HAVING-gated aggregate, then a bounded top-k);
    ties rank by o_orderkey."""
    o, li, c = (spark_tables[t] for t in
                ("orders", "lineitem", "customer"))
    big = (
        li.selectExpr("l_orderkey",
                      "CAST(l_quantity AS BIGINT) AS __qty")
        .groupBy("l_orderkey")
        .agg(F.sum("__qty").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    j = (
        big.join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        j.orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select("o_orderkey", "c_custkey", "c_name",
                F.col("o_orderdate").cast("timestamp")
                .alias("o_orderdate"), "total_qty")
    )


def lapsed_high_balance(spark_tables: dict,
                        cutoff: str = Q22_CUTOFF) -> DataFrame:
    """TPC-H Q22 shape: per nation, count and balance of customers
    whose account balance exceeds the positive-balance average and
    who placed NO order since ``cutoff`` (anti-join). The average
    threshold compares exactly: balances quantize to cents and
    ``bal_cents * n_pos > sum_cents`` is BIGINT arithmetic."""
    c, o, n = (spark_tables[t] for t in
               ("customer", "orders", "nation"))
    cc = c.selectExpr(
        "c_custkey", "c_nationkey",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS __bal")
    pos = cc.filter(F.col("__bal") > 0).agg(
        F.sum("__bal").alias("__s"),
        F.count(F.lit(1)).cast("bigint").alias("__n"))
    recent = o.filter(F.expr(
        f"o_orderdate >= TIMESTAMP '{cutoff}'")).select(
        "o_custkey").distinct()
    eligible = (
        cc.crossJoin(F.broadcast(pos))
        .filter(F.expr("__bal * __n > __s"))
        .join(recent, cc.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        eligible.groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_custs"),
             F.sum("__bal").alias("__tot"))
        .select("n_name", "n_custs",
                round_portable(F.expr("__tot / 100.0"), 2)
                .alias("total_acctbal"))
    )


# --------------------------------------------------------------------------
# Registry plumbing
# --------------------------------------------------------------------------


def _tables(spark: SparkSession, sf_dir: str) -> dict:
    return {t: load(spark, sf_dir, t) for t in
            ("region", "nation", "customer", "supplier", "part",
             "orders", "lineitem")}


def _q(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_tables(spark, sf_dir))
    return run


_D_CENTS = ("CAST(round(l_extendedprice * (1 - l_discount) * 100) "
            "AS BIGINT)")

_ORACLE_Q5 = f"""
WITH j AS (
  SELECT n.n_name, {_D_CENTS} AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
    AND o.o_orderdate >= TIMESTAMP '{Q5_LO}'
    AND o.o_orderdate < TIMESTAMP '{Q5_HI}'
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
    AND c.c_nationkey = s.s_nationkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
    AND r.r_name = '{Q5_REGION}'
)
SELECT n_name,
  {round_portable_duck("CAST(sum(cents) AS BIGINT) / 100.0", 2)}
    AS revenue
FROM j GROUP BY 1
"""

_ORACLE_Q7 = f"""
WITH j AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
    {_D_CENTS} AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('{Q7_N1}', '{Q7_N2}')
    AND n2.n_name IN ('{Q7_N1}', '{Q7_N2}')
    AND n1.n_name != n2.n_name
    AND l.l_shipdate >= TIMESTAMP '{Q7_LO}'
    AND l.l_shipdate < TIMESTAMP '{Q7_HI}'
)
SELECT supp_nation, cust_nation, l_year,
  {round_portable_duck("CAST(sum(cents) AS BIGINT) / 100.0", 2)}
    AS revenue
FROM j GROUP BY 1, 2, 3
"""

_ORACLE_Q8 = f"""
WITH j AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
    {_D_CENTS} AS cents,
    CASE WHEN n.n_name = '{Q8_NATION}' THEN {_D_CENTS}
         ELSE CAST(0 AS BIGINT) END AS nat
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
    AND p.p_type = '{Q8_TYPE}'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT o_year,
  {round_portable_duck(
      "CAST(CAST(sum(nat) AS BIGINT) AS DOUBLE) "
      "/ CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)", 6)}
    AS mkt_share
FROM j GROUP BY 1
"""

_ORACLE_Q10 = f"""
WITH agg AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
    CAST(sum({_D_CENTS}) AS BIGINT) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
    AND o.o_orderdate >= TIMESTAMP '{Q10_LO}'
    AND o.o_orderdate < TIMESTAMP '{Q10_HI}'
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, n_name,
  {round_portable_duck("rev / 100.0", 2)} AS revenue
FROM agg
ORDER BY rev DESC, c_custkey ASC
LIMIT {Q10_TOPK}
"""

_ORACLE_Q14 = f"""
WITH j AS (
  SELECT {_D_CENTS} AS cents,
    CASE WHEN p.p_type = '{Q8_TYPE}' THEN {_D_CENTS}
         ELSE CAST(0 AS BIGINT) END AS promo
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO}'
    AND l.l_shipdate < TIMESTAMP '{Q14_HI}'
)
SELECT {round_portable_duck(
    "100.0 * CAST(CAST(sum(promo) AS BIGINT) AS DOUBLE) "
    "/ CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)", 6)} AS promo_pct
FROM j
"""

_ORACLE_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(sum({_D_CENTS}) AS BIGINT) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
    AND l_shipdate < TIMESTAMP '{Q15_HI}'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name,
  {round_portable_duck("rev.r / 100.0", 2)} AS total_revenue
FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.r = (SELECT max(r) FROM rev)
"""

_ORACLE_Q17 = f"""
WITH bl AS (
  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
    {_D_CENTS} AS cents
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
    AND p.p_brand = '{Q17_BRAND}'
), per_part AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS qsum,
    CAST(count(*) AS BIGINT) AS qcnt
  FROM bl GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_lines,
  {round_portable_duck(
      "COALESCE(CAST(sum(bl.cents) AS BIGINT), 0) / 100.0", 2)}
    AS revenue
FROM bl JOIN per_part pp ON bl.l_partkey = pp.l_partkey
WHERE 5 * bl.qty * pp.qcnt < pp.qsum
"""

_ORACLE_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
    AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS BIGINT)) > {Q18_MIN_QTY}
)
SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_orderdate,
  big.total_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY big.total_qty DESC, o.o_orderkey ASC
LIMIT {Q18_TOPK}
"""

_ORACLE_Q22 = f"""
WITH cc AS (
  SELECT c_custkey, c_nationkey,
    CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer
), pos AS (
  SELECT CAST(sum(bal) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS n
  FROM cc WHERE bal > 0
), eligible AS (
  SELECT cc.c_custkey, cc.c_nationkey, cc.bal
  FROM cc, pos
  WHERE cc.bal * pos.n > pos.s
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = cc.c_custkey
        AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
)
SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_custs,
  {round_portable_duck("CAST(sum(e.bal) AS BIGINT) / 100.0", 2)}
    AS total_acctbal
FROM eligible e JOIN nation n ON e.c_nationkey = n.n_nationkey
GROUP BY 1
"""


QUERIES: dict = {
    "q_local_supplier_volume_nations": (
        _q(local_supplier_volume), _ORACLE_Q5),
    "q_volume_shipping_nations": (_q(volume_shipping), _ORACLE_Q7),
    "q_market_share_parts": (_q(national_market_share), _ORACLE_Q8),
    "q_returned_items_customers": (_q(returned_items), _ORACLE_Q10),
    "q_promo_revenue_parts": (_q(promo_revenue), _ORACLE_Q14),
    "q_top_supplier_revenue": (_q(top_supplier), _ORACLE_Q15),
    "q_small_qty_revenue_lineitem": (
        _q(small_qty_revenue), _ORACLE_Q17),
    "q_large_volume_customers": (
        _q(large_volume_customers), _ORACLE_Q18),
    "q_lapsed_high_balance_customers": (
        _q(lapsed_high_balance), _ORACLE_Q22),
}
