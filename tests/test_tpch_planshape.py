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
