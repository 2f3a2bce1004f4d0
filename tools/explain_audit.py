"""Dump the physical plan of every gate query → PLANS.md.

For each `queries()` entry this records `.explain("formatted")` plus
plan-quality checks that matter at 100 TB:

* PushedFilters / ReadSchema on the parquet scans (predicate pushdown
  + column pruning actually reached the source);
* broadcast vs sort-merge joins;
* number of exchanges (shuffles) and ArrowEvalPython (Python) nodes;
* WholeStageCodegen span count.

Usage: python tools/explain_audit.py [sf_dir] > /dev/null && see PLANS.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def audit(sf_dir: str, out_path: str = "/root/repo/PLANS.md") -> None:
    import __spark_entry__ as entrymod
    from fineweb_modal_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    qs = entrymod.queries()

    lines = [
        "# PLANS — physical plans of every gate query (auto-generated)",
        "",
        f"`python tools/explain_audit.py {sf_dir}` — regenerate after plan",
        "changes. Summary table first; full formatted plans below.",
        "",
        "| query | shuffles | py nodes | codegen spans | broadcast joins | SMJ | scans w/ pushdown |",
        "|---|---|---|---|---|---|---|",
    ]
    details = []
    for name, fn in qs.items():
        if name in ("events_hourly_stream", "sessionize_stream"):
            details.append(
                f"## {name}\n\nStreaming query (AvailableNow) — plan is per-microbatch; "
                "see streaming/incremental.py docstrings.\n"
            )
            lines.append(f"| {name} | (streaming) | | | | | |")
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # count operators from the detail headers only — formatted mode
        # prints each op in the tree AND as a "(N) OpName" detail block
        heads = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.M)
        n_exchange = sum(1 for h in heads if h == "Exchange")
        n_py = sum(
            1 for h in heads
            if h in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        )
        n_wsc = len(set(re.findall(r"codegen id : (\d+)", plan)))
        n_bhj = sum(1 for h in heads if h == "BroadcastHashJoin")
        n_smj = sum(1 for h in heads if h == "SortMergeJoin")
        n_scan = sum(1 for h in heads if h == "Scan")
        n_push = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        lines.append(
            f"| {name} | {n_exchange} | {n_py} | {n_wsc} | {n_bhj} | {n_smj} | {n_push}/{n_scan} |"
        )
        details.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")

    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n\n" + "\n".join(details))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
