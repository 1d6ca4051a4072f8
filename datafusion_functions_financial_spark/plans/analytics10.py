"""TPC-H-shaped multi-join analytics, part 3 (Q2/Q4/Q9/Q11/Q12/Q19/
Q20/Q21 adaptations to the testdata star schema).

Completes the classic join-plan repertoire started in ``analytics8``
(Q3/Q16) and ``analytics9`` (Q5/Q7/Q8/Q10/Q14/Q15/Q17/Q18/Q22): the
correlated-min supplier lookup (Q2), the EXISTS semi-join priority
count (Q4), the multi-dimension profit rollup (Q9), the
scalar-threshold group filter (Q11 HAVING share), the conditional
two-way split (Q12), the disjunctive multi-branch predicate (Q19),
the aggregate-gated semi-join (Q20), and the exists/not-exists
"sole late supplier" shape (Q21). Adaptations for this schema (no
partsupp/shipmode/commitdate/receiptdate): Q2's supply cost becomes
the minimum observed unit sale price from lineitem; Q4/Q12/Q21's
late-delivery predicates become ``l_shipdate > o_orderdate + N
days``; Q9's supply cost becomes ``p_retailprice`` cents x quantity;
Q11's stock value becomes undiscounted line revenue from suppliers
in a nation subset; Q20's agg gate is shipped quantity of
name-prefixed parts.

Engine-exactness: the analytics8/9 conventions — revenue in exact
integer cents (``round(price * (1-disc) * 100)`` per line, BIGINT
sum), quantities integral via BIGINT casts, Q2's unit price
``round(l_extendedprice / l_quantity * 100)`` is one per-row double
expression (identical bits on both engines) quantized to BIGINT
before ANY cross-row comparison, Q11's share threshold is the
integer cross-multiplication ``val * SHARE_DEN > total``, and every
ORDER BY ... LIMIT carries a unique (key, key) tiebreaker.

Plan shape at 100 TB: nation stays broadcast (bounded dimension);
part/supplier/orders joins are left to Catalyst/AQE (scale with SF).
Q2's argmin is aggregate-then-self-join on l_partkey (both sides
already clustered by the groupBy shuffle); Q4's EXISTS is a
semi-join carrying the o_orderdate comparison in the join condition;
Q11's threshold is a 1-row broadcast; Q21 is two reuse-friendly
aggregates over the same (orderkey, suppkey) relation — no
per-order fan-out joins.

Reference anchor: the reference's SQL surface (register_financial
functions + DataFusion SQL) runs arbitrary analytic joins of this
family; see ``/root/reference/src/functions/mod.rs`` for the SQL
registration these plans would execute through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .series import round_portable, round_portable_duck

_CENTS = ("CAST(round(l_extendedprice * (1 - l_discount) * 100) "
          "AS BIGINT)")
# Q2's unit sale price in cents: ONE per-row double expression
# (division then scale, left-associated identically in the oracle),
# rounded to BIGINT before any cross-row min.
_UNIT_CENTS = ("CAST(round(l_extendedprice / l_quantity * 100) "
               "AS BIGINT)")

Q2_TYPE, Q2_MIN_SIZE, Q2_TOPK = "STANDARD", 40, 20
Q4_LO, Q4_HI, Q4_LATE_DAYS = "1997-01-01", "1997-04-01", 60
Q9_NAME_SUBSTR = "widget"
# Q11's HAVING threshold is a MULTIPLE OF THE AVERAGE part value
# (3/2 x), not a fixed total share: a fixed share (the original's
# 0.0001) selects ~0 parts once the part count outgrows 1/share —
# measured 167 rows at sf0.01 but 0 at sf0.1 — while "x times the
# mean" keeps a stable selectivity at every scale (11/124/1087 rows
# at sf0.001/0.01/0.1). Supplier gate is the parity of s_nationkey
# (every SF has even-nation suppliers; "< k" keys don't exist at
# sf0.001's 10-supplier sample).
Q11_AVG_NUM, Q11_AVG_DEN = 3, 2
Q12_LO, Q12_HI, Q12_LATE_DAYS = "1997-01-01", "1998-01-01", 60
Q12_HIGH = ("1-URGENT", "2-HIGH")
Q19_BRANCHES = (("Brand#12", 1, 15, 1, 11),
                ("Brand#23", 1, 10, 10, 20),
                ("Brand#3", 1, 5, 20, 30))
Q20_PREFIX, Q20_LO, Q20_HI, Q20_MIN_QTY = ("red", "1997-01-01",
                                           "1998-01-01", 300)
Q21_LATE_DAYS, Q21_STATUS, Q21_TOPK = 90, "F", 10
Q6_LO, Q6_HI = "1997-01-01", "1998-01-01"
Q6_DISC_LO, Q6_DISC_HI, Q6_MAX_QTY = 0.05, 0.07, 24


def forecast_revenue(spark_tables: dict, lo: str = Q6_LO,
                     hi: str = Q6_HI) -> DataFrame:
    """TPC-H Q6 shape: one row (n_lines, revenue_delta) — the revenue
    change from eliminating small discounts on low-quantity lines in
    one year (pure filter + aggregate; every predicate must reach the
    parquet scan). The discount band compares exactly: discounts are
    hundredths by construction, so ``round(l_discount * 100)`` is an
    integer on both engines."""
    li = spark_tables["lineitem"]
    f = li.filter(F.expr(
        f"l_shipdate >= TIMESTAMP '{lo}' "
        f"AND l_shipdate < TIMESTAMP '{hi}' "
        f"AND CAST(round(l_discount * 100) AS BIGINT) "
        f"BETWEEN {round(Q6_DISC_LO * 100)} "
        f"AND {round(Q6_DISC_HI * 100)} "
        f"AND l_quantity < {Q6_MAX_QTY}"))
    return f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.coalesce(F.sum(F.expr(
            "CAST(round(l_extendedprice * l_discount * 100) "
            "AS BIGINT)")), F.lit(0)).alias("__rev"),
    ).select(
        "n_lines",
        round_portable(F.expr("__rev / 100.0"), 2)
        .alias("revenue_delta"),
    )


def min_price_suppliers(spark_tables: dict, ptype: str = Q2_TYPE,
                        min_size: int = Q2_MIN_SIZE,
                        k: int = Q2_TOPK) -> DataFrame:
    """TPC-H Q2 shape: for each ``ptype`` part of size >=
    ``min_size``, the supplier(s) with the minimum observed unit sale
    price (correlated-min via aggregate + argmin self-join); top-k by
    account balance with a unique (p_partkey, s_suppkey) tiebreak."""
    li, p, s = (spark_tables[t] for t in
                ("lineitem", "part", "supplier"))
    pf = p.filter((F.col("p_type") == ptype)
                  & (F.col("p_size") >= min_size)).select("p_partkey")
    up = (
        li.selectExpr("l_partkey", "l_suppkey",
                      f"{_UNIT_CENTS} AS __up")
        .join(pf, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("__up").alias("__sup_min"))
    )
    pmin = up.groupBy("l_partkey").agg(
        F.min("__sup_min").alias("__pmin")).withColumnRenamed(
        "l_partkey", "__pk")
    return (
        up.join(pmin, (F.col("l_partkey") == F.col("__pk"))
                & (F.col("__sup_min") == F.col("__pmin")))
        .join(s.select("s_suppkey", "s_name", "s_acctbal"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .orderBy(F.col("s_acctbal").desc(), F.col("l_partkey").asc(),
                 F.col("s_suppkey").asc())
        .limit(k)
        .select(F.col("l_partkey").alias("p_partkey"), "s_suppkey",
                "s_name",
                round_portable(F.expr("s_acctbal * 1.0"), 2)
                .alias("s_acctbal"),
                round_portable(F.expr("__sup_min / 100.0"), 2)
                .alias("min_price"))
    )


def priority_late_orders(spark_tables: dict, lo: str = Q4_LO,
                         hi: str = Q4_HI,
                         late_days: int = Q4_LATE_DAYS) -> DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders in
    [lo, hi) had at least one line shipped more than ``late_days``
    after the order date (EXISTS -> semi-join with the date
    comparison inside the join condition)."""
    o, li = spark_tables["orders"], spark_tables["lineitem"]
    o_f = o.filter(F.expr(
        f"o_orderdate >= TIMESTAMP '{lo}' "
        f"AND o_orderdate < TIMESTAMP '{hi}'"))
    late = li.select("l_orderkey", "l_shipdate")
    sem = o_f.join(
        late,
        (o_f.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > F.expr(
            f"o_orderdate + INTERVAL {late_days} DAYS")),
        "left_semi")
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


def profit_by_nation_year(spark_tables: dict,
                          substr: str = Q9_NAME_SUBSTR) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus retail-cost cents x
    quantity) by supplier nation and order year, over parts whose
    name contains ``substr``."""
    li, p, s, n, o = (spark_tables[t] for t in
                      ("lineitem", "part", "supplier", "nation",
                       "orders"))
    pf = p.filter(F.col("p_name").contains(substr)).selectExpr(
        "p_partkey",
        "CAST(round(p_retailprice * 100) AS BIGINT) AS __cost_cents")
    j = (
        li.selectExpr("l_orderkey", "l_partkey", "l_suppkey",
                      f"{_CENTS} AS __rev",
                      "CAST(l_quantity AS BIGINT) AS __qty")
        .join(pf, F.col("l_partkey") == F.col("p_partkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        j.selectExpr("n_name",
                     "CAST(year(o_orderdate) AS BIGINT) AS o_year",
                     "__rev - __cost_cents * __qty AS __profit")
        .groupBy("n_name", "o_year")
        .agg(F.sum("__profit").alias("__p"))
        .select("n_name", "o_year",
                round_portable(F.expr("__p / 100.0"), 2)
                .alias("profit"))
    )


def important_parts(spark_tables: dict,
                    avg_num: int = Q11_AVG_NUM,
                    avg_den: int = Q11_AVG_DEN) -> DataFrame:
    """TPC-H Q11 shape: parts whose undiscounted revenue from
    even-nation suppliers exceeds ``avg_num/avg_den`` times the mean
    part value (scalar-subquery HAVING; the threshold compares the
    cross-multiplication ``val * n * den > num * total`` in DOUBLE
    with one-factor-at-a-time casts — at 100 TB the BIGINT triple
    product (hot-part cents ~1e9 x ~1e10 parts) would pass int64 and
    Spark wraps silently with ANSI off while DuckDB errors; the gate
    is selectivity, not exactness, so DOUBLE is the right contract —
    scale-invariant selectivity, see the constants' comment)."""
    li, s = spark_tables["lineitem"], spark_tables["supplier"]
    pv = (
        li.selectExpr("l_partkey", "l_suppkey",
                      "CAST(round(l_extendedprice * 100) AS BIGINT)"
                      " AS __val")
        .join(s.filter(F.col("s_nationkey") % 2 == 0)
              .select("s_suppkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("__val").alias("__pv"))
    )
    tot = pv.agg(F.sum("__pv").alias("__tot"),
                 F.count(F.lit(1)).cast("bigint").alias("__n"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.expr(
            f"CAST(__pv AS DOUBLE) * CAST(__n AS DOUBLE) * {avg_den} "
            f"> {avg_num} * CAST(__tot AS DOUBLE)"))
        .select(F.col("l_partkey").alias("p_partkey"),
                round_portable(F.expr("__pv / 100.0"), 2)
                .alias("value"))
    )


def late_lines_by_status(spark_tables: dict, lo: str = Q12_LO,
                         hi: str = Q12_HI,
                         late_days: int = Q12_LATE_DAYS) -> DataFrame:
    """TPC-H Q12 shape: late-shipped lines in [lo, hi) split by line
    status into high-priority vs low-priority order counts
    (conditional two-way aggregate over a fact-fact join)."""
    li, o = spark_tables["lineitem"], spark_tables["orders"]
    hi_list = ", ".join(f"'{x}'" for x in Q12_HIGH)
    j = (
        li.filter(F.expr(
            f"l_shipdate >= TIMESTAMP '{lo}' "
            f"AND l_shipdate < TIMESTAMP '{hi}'"))
        .select("l_orderkey", "l_linestatus", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate",
                       "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.expr(
            f"l_shipdate > o_orderdate + INTERVAL {late_days} DAYS"))
    )
    return (
        j.groupBy("l_linestatus")
        .agg(
            F.sum(F.expr(
                f"CASE WHEN o_orderpriority IN ({hi_list}) "
                "THEN 1 ELSE 0 END")).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.expr(
                f"CASE WHEN o_orderpriority IN ({hi_list}) "
                "THEN 0 ELSE 1 END")).cast("bigint")
            .alias("low_line_count"),
        )
    )


def disjunctive_revenue(spark_tables: dict,
                        branches=Q19_BRANCHES) -> DataFrame:
    """TPC-H Q19 shape: one row (n_lines, revenue) over an OR of
    (brand, size range, quantity range) conjunctions — the
    disjunctive-predicate join Catalyst must not expand into a
    cartesian product."""
    li, p = spark_tables["lineitem"], spark_tables["part"]
    pred = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {s_lo} AND {s_hi} "
        f"AND l_quantity BETWEEN {q_lo} AND {q_hi})"
        for b, s_lo, s_hi, q_lo, q_hi in branches)
    j = (
        li.selectExpr("l_partkey", "l_quantity", f"{_CENTS} AS __cents")
        .join(p.select("p_partkey", "p_brand", "p_size"),
              F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.expr(pred))
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.coalesce(F.sum("__cents"), F.lit(0)).alias("__rev"),
    ).select(
        "n_lines",
        round_portable(F.expr("__rev / 100.0"), 2).alias("revenue"),
    )


def excess_qty_suppliers(spark_tables: dict, prefix: str = Q20_PREFIX,
                         lo: str = Q20_LO, hi: str = Q20_HI,
                         min_qty: int = Q20_MIN_QTY) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than ``min_qty``
    units of ``prefix``-named parts in [lo, hi) — an aggregate-gated
    semi-join back to the supplier dimension."""
    li, p, s = (spark_tables[t] for t in
                ("lineitem", "part", "supplier"))
    pf = p.filter(F.col("p_name").startswith(prefix)).select(
        "p_partkey")
    sq = (
        li.filter(F.expr(
            f"l_shipdate >= TIMESTAMP '{lo}' "
            f"AND l_shipdate < TIMESTAMP '{hi}'"))
        .selectExpr("l_partkey", "l_suppkey",
                    "CAST(l_quantity AS BIGINT) AS __qty")
        .join(pf, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("__qty").alias("qty_shipped"))
        .filter(F.col("qty_shipped") > min_qty)
    )
    return (
        sq.join(s.select("s_suppkey", "s_name"),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "qty_shipped")
    )


def waiting_suppliers(spark_tables: dict,
                      late_days: int = Q21_LATE_DAYS,
                      status: str = Q21_STATUS,
                      k: int = Q21_TOPK) -> DataFrame:
    """TPC-H Q21 shape: top-``k`` suppliers who were the SOLE late
    shipper on multi-supplier '``status``' orders. Two stacked
    aggregates over one (orderkey, suppkey, late) relation replace
    the original's EXISTS + NOT EXISTS pair — no per-order fan-out
    join."""
    li, o, s = (spark_tables[t] for t in
                ("lineitem", "orders", "supplier"))
    os_rel = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.filter(F.col("o_orderstatus") == status)
              .select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.expr(
            f"CASE WHEN l_shipdate > o_orderdate "
            f"+ INTERVAL {late_days} DAYS THEN 1 ELSE 0 END"))
            .alias("__late"))
    )
    od = os_rel.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ns"),
        F.sum("__late").cast("bigint").alias("__nl"),
    )
    cnt = (
        os_rel.filter(F.col("__late") == 1)
        .join(od, "l_orderkey")
        .filter((F.col("__ns") > 1) & (F.col("__nl") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
    return (
        cnt.join(s.select("s_suppkey", "s_name"),
                 F.col("l_suppkey") == F.col("s_suppkey"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(k)
        .select("s_suppkey", "s_name", "numwait")
    )


# --------------------------------------------------------------------------
# Registry plumbing
# --------------------------------------------------------------------------


def _tables(spark: SparkSession, sf_dir: str) -> dict:
    return {t: load(spark, sf_dir, t) for t in
            ("nation", "customer", "supplier", "part", "orders",
             "lineitem")}


def _q(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_tables(spark, sf_dir))
    return run


_ORACLE_Q2 = f"""
WITH up AS (
  SELECT l_partkey, l_suppkey,
    CAST(min(CAST(round(l_extendedprice / l_quantity * 100)
             AS BIGINT)) AS BIGINT) AS sup_min
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{Q2_TYPE}' AND p_size >= {Q2_MIN_SIZE}
  GROUP BY 1, 2
), pmin AS (
  SELECT l_partkey, min(sup_min) AS pm FROM up GROUP BY 1
)
SELECT up.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
  {round_portable_duck("s.s_acctbal * 1.0", 2)} AS s_acctbal,
  {round_portable_duck("up.sup_min / 100.0", 2)} AS min_price
FROM up
JOIN pmin ON up.l_partkey = pmin.l_partkey AND up.sup_min = pmin.pm
JOIN supplier s ON up.l_suppkey = s.s_suppkey
ORDER BY s.s_acctbal DESC, up.l_partkey ASC, s.s_suppkey ASC
LIMIT {Q2_TOPK}
"""

_ORACLE_Q4 = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_LO}'
  AND o.o_orderdate < TIMESTAMP '{Q4_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY 1
"""

_ORACLE_Q9 = f"""
WITH j AS (
  SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
    CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
      AS BIGINT)
    - CAST(round(p.p_retailprice * 100) AS BIGINT)
      * CAST(l.l_quantity AS BIGINT) AS profit_c
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
    AND p.p_name LIKE '%{Q9_NAME_SUBSTR}%'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT n_name, o_year,
  {round_portable_duck("CAST(sum(profit_c) AS BIGINT) / 100.0", 2)}
    AS profit
FROM j GROUP BY 1, 2
"""

_ORACLE_Q11 = f"""
WITH pv AS (
  SELECT l_partkey,
    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      AS BIGINT) AS pvv
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey % 2 = 0
  GROUP BY 1
), tot AS (
  SELECT CAST(sum(pvv) AS BIGINT) AS t,
    CAST(count(*) AS BIGINT) AS n
  FROM pv
)
SELECT pv.l_partkey AS p_partkey,
  {round_portable_duck("pv.pvv / 100.0", 2)} AS value
FROM pv, tot
WHERE CAST(pv.pvv AS DOUBLE) * CAST(tot.n AS DOUBLE) * {Q11_AVG_DEN}
  > {Q11_AVG_NUM} * CAST(tot.t AS DOUBLE)
"""

_Q12_HI_LIST = ", ".join(f"'{x}'" for x in Q12_HIGH)

_ORACLE_Q12 = f"""
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ({_Q12_HI_LIST})
    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ({_Q12_HI_LIST})
    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_LO}'
  AND l_shipdate < TIMESTAMP '{Q12_HI}'
  AND l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY 1
"""

_Q19_PRED = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {s_lo} AND {s_hi} "
    f"AND l_quantity BETWEEN {q_lo} AND {q_hi})"
    for b, s_lo, s_hi, q_lo, q_hi in Q19_BRANCHES)

_ORACLE_Q19 = f"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
  {round_portable_duck(
      "CAST(coalesce(sum(CAST(round(l_extendedprice * (1 - l_discount)"
      " * 100) AS BIGINT)), 0) AS BIGINT) / 100.0", 2)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_Q19_PRED}
"""

_ORACLE_Q20 = f"""
WITH sq AS (
  SELECT l_suppkey,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_shipped
  FROM lineitem JOIN part ON l_partkey = p_partkey
    AND p_name LIKE '{Q20_PREFIX}%'
  WHERE l_shipdate >= TIMESTAMP '{Q20_LO}'
    AND l_shipdate < TIMESTAMP '{Q20_HI}'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, sq.qty_shipped
FROM sq JOIN supplier s ON sq.l_suppkey = s.s_suppkey
WHERE sq.qty_shipped > {Q20_MIN_QTY}
"""

_ORACLE_Q21 = f"""
WITH os_rel AS (
  SELECT l_orderkey, l_suppkey,
    max(CASE WHEN l_shipdate > o_orderdate
      + INTERVAL {Q21_LATE_DAYS} DAY THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    AND o_orderstatus = '{Q21_STATUS}'
  GROUP BY 1, 2
), od AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS ns,
    CAST(sum(late) AS BIGINT) AS nl
  FROM os_rel GROUP BY 1
), cnt AS (
  SELECT o.l_suppkey, CAST(count(*) AS BIGINT) AS numwait
  FROM os_rel o JOIN od ON o.l_orderkey = od.l_orderkey
  WHERE o.late = 1 AND od.ns > 1 AND od.nl = 1
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, cnt.numwait
FROM cnt JOIN supplier s ON cnt.l_suppkey = s.s_suppkey
ORDER BY cnt.numwait DESC, s.s_suppkey ASC
LIMIT {Q21_TOPK}
"""


_ORACLE_Q6 = f"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
  {round_portable_duck(
      "CAST(coalesce(sum(CAST(round(l_extendedprice * l_discount "
      "* 100) AS BIGINT)), 0) AS BIGINT) / 100.0", 2)}
    AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
  AND l_shipdate < TIMESTAMP '{Q6_HI}'
  AND CAST(round(l_discount * 100) AS BIGINT)
    BETWEEN {round(Q6_DISC_LO * 100)} AND {round(Q6_DISC_HI * 100)}
  AND l_quantity < {Q6_MAX_QTY}
"""


QUERIES: dict = {
    "q_forecast_revenue_lineitem": (_q(forecast_revenue), _ORACLE_Q6),
    "q_min_price_suppliers_parts": (_q(min_price_suppliers),
                                    _ORACLE_Q2),
    "q_priority_late_orders": (_q(priority_late_orders), _ORACLE_Q4),
    "q_profit_nation_year": (_q(profit_by_nation_year), _ORACLE_Q9),
    "q_important_parts_lineitem": (_q(important_parts), _ORACLE_Q11),
    "q_late_lines_by_status": (_q(late_lines_by_status), _ORACLE_Q12),
    "q_disjunctive_revenue_parts": (_q(disjunctive_revenue),
                                    _ORACLE_Q19),
    "q_excess_qty_suppliers": (_q(excess_qty_suppliers), _ORACLE_Q20),
    "q_waiting_suppliers": (_q(waiting_suppliers), _ORACLE_Q21),
}
