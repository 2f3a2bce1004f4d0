"""TPC-H relational suite over the TPC-H-ish fixtures (q4–q22).

Completes the relational-depth battery started in queries.py
(q1/q3/q5/q6/q18): every remaining TPC-H query expressible over the
fixture schema, Spark-first (broadcast dims, semi/anti joins,
window-based correlated subqueries, conditional aggregation) with an
independent DuckDB oracle each.

The fixtures are a REDUCED TPC-H schema (TESTDATA.md): no partsupp
table and no l_commitdate / l_receiptdate / l_shipmode /
p_container / c_phone columns. The partsupp queries
(q2/q9/q11/q16/q20) run over a DERIVED partsupp — a deterministic
pure function of part × supplier rendered identically in both
dialects (PARTSUPP_SQL below), completing all 22 queries; queries
that need a missing column are adapted to an equivalent predicate on
an existing column so the PLAN SHAPE (the thing the engine must
demonstrate) is preserved:

- q4  EXISTS(l_commitdate<l_receiptdate) → EXISTS(l_returnflag='R')
      (same semi-join + group-by-priority shape)
- q12 l_shipmode class split → o_orderpriority class split over the
      same join + conditional-count shape
- q13 o_comment NOT LIKE filter → o_orderpriority <> filter on the
      same left-outer join ON-clause
- q17/q19 p_container → p_size band (same broadcast-dim + correlated
      avg / OR-of-ANDs shapes)
- q21 "kept waiting" (receipt>commit) → l_returnflag='R' as the
      failure marker (same EXISTS other-supplier + NOT EXISTS
      other-failed-supplier shape)
- q22 phone country code → c_nationkey % 10 (same anti-join +
      global scalar-subquery shape)

At 100 TB the shapes here are exactly the ones that matter: the fact
table (lineitem) is never broadcast, all dims are; semi/anti joins
shuffle on the fact key once; correlated per-group scalars are
windows (one shuffle) instead of self-joins (two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import register


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def _disc():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → left-semi join)
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
"""


@register("tpch_q4_order_priority", _Q4_ORACLE)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: one shuffle on the order key, the
    priority rollup is a tiny two-phase agg. The quarter predicate is
    pushed to the orders scan."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    flagged = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(flagged, o.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00')
GROUP BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7_volume_shipping", _Q7_ORACLE)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair trade volume by ship year. Both nation lookups are
    broadcast (the same dim twice under different aliases); the
    nation-pair disjunction is applied after both are attached so the
    fact rows stream through a single filter."""
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(_disc()), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_6' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00')
GROUP BY o_year
"""


@register("tpch_q8_market_share", _Q8_ORACLE)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_6's share of AMERICA-region PROMO revenue per order
    year: ratio of conditional sum to total sum in ONE aggregation
    pass (no second scan for the denominator). Seven-way join, fact
    table shuffles zero times — every dim is broadcast."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rk")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = _disc()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rk") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_6", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       round(c.c_acctbal, 4) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


@register("tpch_q10_returned_items", _Q10_ORACLE)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lost revenue per customer from returns in one quarter, top 20.
    Aggregate first, hydrate customer/nation attributes by broadcast,
    TakeOrderedAndProject for the limit. Ties broken by c_custkey so
    the cut at rank 20 is deterministic on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum(_disc()), 4).alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — priority class split (shipmode adapted: no l_shipmode column)
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
"""


@register("tpch_q12_priority_class", _Q12_ORACLE)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's join + conditional-count shape over l_returnflag classes
    (the fixture has no l_shipmode). Orders is projected to two
    columns and broadcast; the year predicate is pushed to the
    lineitem scan."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer + double agg)
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey)
GROUP BY c_count
"""


@register("tpch_q13_customer_distribution", _Q13_ORACLE)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts, keeping zero-order
    customers via LEFT OUTER with the filter in the ON clause (the
    fixture has no o_comment, so the NOT-LIKE filter becomes a
    priority exclusion — same plan shape). count(col) skips the
    nulls the outer join introduces, exactly like the SQL."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share (works verbatim: p_type='PROMO' exists)
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@register("tpch_q14_promo_effect", _Q14_ORACLE)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of one month's revenue from PROMO parts: single scan,
    part broadcast, numerator and denominator in one global agg."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _disc()).otherwise(F.lit(0.0)))
                / F.sum(_disc()),
                6,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (revenue view + scalar max subquery)
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("tpch_q15_top_supplier", _Q15_ORACLE)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar max-subquery is a 1-row aggregate broadcast back
    onto the (already tiny) per-supplier revenue relation — no second
    lineitem scan, no window over the whole fact table. Revenue is
    rounded BEFORE the max comparison on both engines so the equality
    is on identical 4-dp values."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_disc()), 4).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg → window)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM (SELECT l.l_extendedprice, l.l_quantity,
             0.2 * avg(l.l_quantity)
                   OVER (PARTITION BY l.l_partkey) AS qty_thresh
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#23' AND p.p_size < 5)
WHERE l_quantity < qty_thresh
"""


@register("tpch_q17_small_quantity", _Q17_ORACLE)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H's correlated scalar subquery (per-part avg quantity) as
    a window over the part key: ONE pass over the brand-filtered
    lineitem instead of the naive self-join's two. p_container does
    not exist in the fixture; p_size < 5 stands in (same broadcast
    prefilter shape). Quantities are whole numbers, so sum order
    cannot perturb the double avg — the 0.2·avg threshold is
    bit-identical on both engines."""
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 5))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).withColumn(
        "qty_thresh", F.lit(0.2) * F.avg("l_quantity").over(w)
    )
    return j.where(F.col("l_quantity") < F.col("qty_thresh")).agg(
        F.round(F.sum("l_extendedprice") / F.lit(7.0), 4).alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (OR-of-ANDs disjunctive pushdown)
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("tpch_q19_discounted_revenue", _Q19_ORACLE)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of brand/size/quantity bands (p_container adapted
    to p_size). The part side is prefiltered to the UNION of the
    three brand+size bands before the broadcast — Catalyst can't
    split a mixed-table OR across the join, so we hoist the
    part-only implication by hand; the residual mixed predicate
    runs post-join."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    part_side = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    full = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p.where(part_side)), l.l_partkey == p.p_partkey)
        .where(full)
        .agg(F.round(F.sum(_disc()), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND n.n_name IN ('NATION_3', 'NATION_7')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s_name ASC LIMIT 100
"""


@register("tpch_q21_waiting_supplier", _Q21_ORACLE)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-failing-supplier detection: EXISTS → left-semi self-join,
    NOT EXISTS → left-anti self-join, both equi on the order key with
    a supplier-inequality residual (the fixture has no commit/receipt
    dates, so l_returnflag='R' is the failure marker — identical
    join topology). The two self-joins reuse the same l_orderkey
    shuffle partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    base = (
        l1.join(F.broadcast(o), l1.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("l_orderkey", "l_suppkey", "s_name")
        .alias("b")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    ).alias("l2")
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("y_orderkey"),
            F.col("l_suppkey").alias("y_suppkey"),
        )
        .alias("l3")
    )
    other = (F.col("x_orderkey") == F.col("b.l_orderkey")) & (
        F.col("x_suppkey") != F.col("b.l_suppkey")
    )
    other_failed = (F.col("y_orderkey") == F.col("b.l_orderkey")) & (
        F.col("y_suppkey") != F.col("b.l_suppkey")
    )
    return (
        base.join(l2, other, "left_semi")
        .join(l3, other_failed, "left_anti")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (anti-join + global scalar subquery)
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_acctbal,
         CAST(c_nationkey % 10 AS INT) AS cntrycode
  FROM customer WHERE (c_nationkey % 10) IN (1, 2, 3, 4, 5)),
ab AS (SELECT avg(c_acctbal) AS a FROM base WHERE c_acctbal > 0.0)
SELECT cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 4) AS totacctbal
FROM base, ab
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = base.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY cntrycode
"""


@register("tpch_q22_sales_opportunity", _Q22_ORACLE)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle rich customers who never ordered, bucketed by country
    code (c_phone doesn't exist; c_nationkey % 10 is the code). The
    global avg is a 1-row broadcast cross-join; the NOT EXISTS is a
    left-anti against the projected orders keys. The anti side is
    date-windowed ("no order since 1999") because every fixture
    customer has SOME order — the unwindowed original would be an
    empty (vacuously-green) gate."""
    base = (
        load_table(spark, sf_dir, "customer")
        .where((F.col("c_nationkey") % 10).isin(1, 2, 3, 4, 5))
        .select(
            "c_custkey",
            "c_acctbal",
            (F.col("c_nationkey") % 10).cast("int").alias("cntrycode"),
        )
    )
    ab = base.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("a"))
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    return (
        base.crossJoin(F.broadcast(ab))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, base.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the one missing TPC-H table, synthesized
# deterministically from part × supplier (same discipline as the
# derived pages corpus — a pure function of the fixture keys, rendered
# identically in both dialects), enabling q2/q9/q11/q16/q20.
# ---------------------------------------------------------------------------

# ONE ANSI string valid in BOTH dialects: 4 suppliers per part via
# modular spread, integer-exact qty, cost with a single /100 division.
PARTSUPP_SQL = """
SELECT p.p_partkey AS ps_partkey,
       CAST((p.p_partkey * 4 + j.j) % sc.s_cnt + 1 AS BIGINT) AS ps_suppkey,
       CAST((p.p_partkey * 7 + j.j * 13) % 9999 + 1 AS INT) AS ps_availqty,
       CAST((p.p_partkey * 31 + j.j * 17) % 100000 AS DOUBLE) / 100.0 + 1.0 AS ps_supplycost
FROM part p
CROSS JOIN (SELECT 0 AS j UNION ALL SELECT 1 UNION ALL
            SELECT 2 UNION ALL SELECT 3) j
CROSS JOIN (SELECT count(*) AS s_cnt FROM supplier) sc
""".strip()


def load_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp as a dim-sized row-local expansion of part — zero
    shuffle (the 4-row j relation and the 1-row supplier count are
    broadcast literals)."""
    p = load_table(spark, sf_dir, "part")
    s_cnt = load_table(spark, sf_dir, "supplier").count()
    j = spark.range(4).select(F.col("id").cast("int").alias("j"))
    pk, jj = F.col("p_partkey"), F.col("j")
    return p.crossJoin(F.broadcast(j)).select(
        pk.alias("ps_partkey"),
        ((pk * 4 + jj) % s_cnt + 1).cast("bigint").alias("ps_suppkey"),
        ((pk * 7 + jj * 13) % 9999 + 1).cast("int").alias("ps_availqty"),
        (
            ((pk * 31 + jj * 17) % 100000).cast("double") / 100.0 + 1.0
        ).alias("ps_supplycost"),
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part in a region (correlated min →
# window over the filtered join; p_mfgr adapted to p_brand)
# ---------------------------------------------------------------------------

_Q2_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL}),
eligible AS (
  SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, s.s_acctbal,
         n.n_name, ps.ps_supplycost,
         min(ps.ps_supplycost) OVER (PARTITION BY p.p_partkey) AS min_cost
  FROM part p
  JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_size <= 25 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       round(ps_supplycost, 2) AS ps_supplycost
FROM eligible WHERE ps_supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
""".strip()


@register("tpch_q2_min_cost_supplier", _Q2_ORACLE)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated min-cost subquery as ONE window over the
    filtered join (no self-join): dims broadcast, partsupp never
    shuffles more than once on the part key."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 25) & (F.col("p_type") == "ECONOMY")
    )
    ps = load_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    j = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round("ps_supplycost", 2).alias("ps_supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL})
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - ps.ps_supplycost * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                AND ps.ps_suppkey = l.l_suppkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
""".strip()


@register("tpch_q9_product_profit", _Q9_ORACLE)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit rollup: lineitem joins four BROADCAST relations (part,
    derived partsupp, supplier, nation) and shuffles only for the
    orders equi-join + the final two-phase agg. NOTE: a partsupp
    miss on (partkey, suppkey) would silently drop fact rows — the
    derivation guarantees coverage only for suppkeys the modular
    spread emits, so the join is on BOTH keys exactly as TPC-H."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")
    )
    ps = load_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(
            F.broadcast(ps),
            (l.l_partkey == ps.ps_partkey) & (l.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification (global scalar → broadcast)
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL}),
national AS (
  SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS v
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
),
tot AS (SELECT sum(v) AS total_v FROM national)
SELECT ps_partkey, round(sum(v), 2) AS value
FROM national CROSS JOIN tot
GROUP BY ps_partkey, tot.total_v
HAVING sum(v) > 0.005 * tot.total_v
""".strip()


@register("tpch_q11_important_stock", _Q11_ORACLE)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING-over-global-fraction shape: the national inventory
    aggregates once, the 1-row total broadcasts back — no second scan
    of partsupp, no correlated subquery."""
    ps = load_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    national = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = national.groupBy("ps_partkey").agg(F.sum("v").alias("sv"))
    tot = national.agg(F.sum("v").alias("total_v"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .where(F.col("sv") > 0.005 * F.col("total_v"))
        .select("ps_partkey", F.round("sv", 2).alias("value"))
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (NOT-IN anti-join + count distinct;
# supplier "complaints" adapted to s_acctbal < 0)
# ---------------------------------------------------------------------------

_Q16_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL})
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 5, 11, 15, 21, 28)
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
""".strip()


@register("tpch_q16_supplier_relationship", _Q16_ORACLE)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN as a broadcast LEFT ANTI join (null-safe here: suppkeys
    are non-null by construction), then a two-phase distinct-count.
    The IN-list and NOT-LIKE prune at the broadcast part dim."""
    ps = load_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 11, 15, 21, 28))
    )
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-joins)
# ---------------------------------------------------------------------------

_Q20_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL}),
shipped AS (
  SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps
  JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                 AND sh.l_suppkey = ps.ps_suppkey
  WHERE ps.ps_availqty > sh.half_qty
    AND ps.ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    )
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (SELECT ps_suppkey FROM excess)
""".strip()


@register("tpch_q20_part_promotion", _Q20_ORACLE)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN-subqueries as a semi-join chain: the shipped-volume
    agg is the only fact shuffle; partsupp, the red-part key set and
    the qualifying-supplier set all broadcast."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    shipped = l.groupBy("l_partkey", "l_suppkey").agg(
        (0.5 * F.sum("l_quantity")).alias("half_qty")
    )
    red = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    ps = load_partsupp(spark, sf_dir).join(
        F.broadcast(red),
        F.col("ps_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    excess = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .where(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(excess),
            s.s_suppkey == excess.ps_suppkey,
            "left_semi",
        )
        .select("s_name", "n_name")
    )
