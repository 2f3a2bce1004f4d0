"""Plan-shape guards for the TPC-H battery's scale claims.

Q6's entire cost model is "the scan materializes almost nothing":
every predicate must reach the parquet reader (PushedFilters) and the
ReadSchema must carry only the referenced columns. Q18 must build the
heavy-hitter key set ONCE and probe it with a semi-join — not join
lineitem against itself. These are the properties that survive a 100×
scale-up; this test pins them so a refactor can't silently regress
the plan while keeping the answer right.
"""

from __future__ import annotations

import re

from fineweb_modal_spark.plans.queries import queries

QUERIES = queries()

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_predicates_pushed_and_schema_pruned(spark):
    plan = _plan(QUERIES["tpch_q6_forecast_revenue"](spark, SF))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed, plan[:2000]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed.group(1), (col, pushed.group(1))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan[:2000]
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    assert cols == {
        "l_shipdate",
        "l_discount",
        "l_quantity",
        "l_extendedprice",
    }, cols


def test_q18_semi_join_single_self_scan(spark):
    plan = _plan(QUERIES["tpch_q18_large_volume_customer"](spark, SF))
    assert "LeftSemi" in plan, plan[:2000]
    # lineitem is scanned exactly twice: once for the qualifying-key
    # agg, once for hydration — never a third time.
    n_lineitem_scans = len(re.findall(r"Scan parquet[^\n]*\n[^\n]*lineitem", plan)) or plan.count(
        "lineitem.parquet"
    )
    assert n_lineitem_scans <= 2, (n_lineitem_scans, plan[:2000])


def test_q4_exists_is_semi_join(spark):
    plan = _plan(QUERIES["tpch_q4_order_priority"](spark, SF))
    assert "LeftSemi" in plan, plan[:2000]
    # the quarter predicate reaches the orders scan
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("o_orderdate" in p for p in pushed), pushed


def test_q8_fact_never_shuffles_before_agg(spark):
    """All seven dims broadcast: the only exchange in the plan is the
    final single-partition gather for the year rollup."""
    plan = _plan(QUERIES["tpch_q8_market_share"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 6, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_q17_correlated_avg_is_window_not_self_join(spark):
    """The per-part avg threshold must be a window (one lineitem
    scan), not the naive rewrite's second scan + self-join."""
    plan = _plan(QUERIES["tpch_q17_small_quantity"](spark, SF))
    assert "Window" in plan, plan[:2000]
    n_lineitem_scans = plan.count("lineitem.parquet")
    assert n_lineitem_scans <= 1, (n_lineitem_scans, plan[:2000])


def test_q21_semi_and_anti_self_joins(spark):
    plan = _plan(QUERIES["tpch_q21_waiting_supplier"](spark, SF))
    assert "LeftSemi" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]


def test_q22_anti_join_and_broadcast_scalar(spark):
    plan = _plan(QUERIES["tpch_q22_sales_opportunity"](spark, SF))
    assert "LeftAnti" in plan, plan[:2000]
    # the global-avg scalar arrives by broadcast, never a shuffle of base
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:3000]


def test_q19_part_side_prefilter_reaches_scan(spark):
    """The hoisted part-only implication of the OR must prune the
    broadcast build side at its scan (brand IN-set pushed)."""
    plan = _plan(QUERIES["tpch_q19_discounted_revenue"](spark, SF))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("p_brand" in p for p in pushed), pushed


def test_partsupp_derivation_invariants(spark):
    """The derived partsupp is a valid TPC-H-shaped relation: exactly
    4 rows per part, (partkey, suppkey) unique, suppkeys inside the
    supplier key range, costs positive."""
    from pyspark.sql import functions as F

    from fineweb_modal_spark.plans import tpch

    sf = "/root/testdata/sf0.001"
    ps = tpch.load_partsupp(spark, sf)
    n_part = spark.read.parquet(f"{sf}/part.parquet").count()
    n_supp = spark.read.parquet(f"{sf}/supplier.parquet").count()
    assert ps.count() == 4 * n_part
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == 4 * n_part
    row = ps.agg(
        F.min("ps_suppkey").alias("lo"), F.max("ps_suppkey").alias("hi"),
        F.min("ps_supplycost").alias("c"), F.min("ps_availqty").alias("q"),
    ).collect()[0]
    assert 1 <= row["lo"] and row["hi"] <= n_supp
    assert row["c"] > 0 and row["q"] >= 1
