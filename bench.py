"""Per-round benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line::

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the ``noop`` sink (full
computation on executors, nothing collected to the driver) — the same
way a cluster job would be bounded by scan+compute+shuffle, not by
driver materialization.

``python bench.py --scaling`` additionally runs the flagship pipeline
at two parallelism levels (local[8] vs local[32] by default) in fresh
JVM-session pairs and reports throughput-scaling efficiency — the
sandbox stand-in for the north rule's N vs 4N executor-cluster
criterion (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fineweb_modal_spark.session import get_spark  # noqa: E402

# Headline set: the full north-rule DAG plus the heaviest operator
# families (shuffle topk, hash dedup, window sessionize, regex scrub).
HEADLINE = [
    "pipeline_full",  # langid -> quality -> ppl -> keep -> scrub (UDF+codegen)
    "summary_by_source",  # partial+final agg
    "topk_per_feature",  # posexplode + window shuffle
    "dedup_exact",  # hash groupBy
    "sessionize",  # window lag + cumsum + agg
    "scrub_text",  # regex chain, whole-stage codegen
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run_once(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod
    from fineweb_modal_spark.plans import pipeline as pl

    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        if name == "pipeline_full":
            _force(pl.run_pipeline(spark, sf_dir))
        else:
            _force(qs[name](spark, sf_dir))
        times[name] = round(time.monotonic() - t0, 3)
    return times


def _n_docs(spark, sf_dir: str) -> int:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()


def _warmup(spark) -> None:
    """Warm the JVM and ALL Python UDF workers before timing.

    32 workers cold-importing pandas/numpy from disk concurrently can
    cost ~60 s of pure import I/O on an evicted page cache — that is
    environment noise, not engine throughput, so it is paid here once.
    """
    from fineweb_modal_spark.plans import pipeline as pl

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _force(pl.run_pipeline(spark, "/root/testdata/sf0.001"))


def bench(sf_dir: str) -> dict:
    spark = get_spark(app_name="bench")
    _warmup(spark)
    n_docs = _n_docs(spark, sf_dir)
    times = _run_once(spark, sf_dir)
    total = round(sum(times.values()), 3)
    docs_per_sec = round(n_docs / times["pipeline_full"], 1)
    return {
        "metric": "headline_queries_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "n_docs": n_docs,
        "pipeline_docs_per_sec": docs_per_sec,
    }


def scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Same pipeline job at two parallelism levels; efficiency =
    (throughput_hi / throughput_lo) / (hi / lo). Sessions are torn
    down between runs so shuffle sizing matches each core count."""
    from pyspark.sql import SparkSession

    from fineweb_modal_spark.plans import pipeline as pl

    results = {}
    for cores in (lo, hi):
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = get_spark(master=f"local[{cores}]", app_name=f"scale{cores}")
        _warmup(spark)
        n_docs = _n_docs(spark, sf_dir)
        t0 = time.monotonic()
        _force(pl.run_pipeline(spark, sf_dir))
        dt = time.monotonic() - t0
        results[cores] = {"sec": round(dt, 3), "docs_per_sec": round(n_docs / dt, 1)}
        spark.stop()
    speedup = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]
    eff = speedup / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "lo_cores": lo,
        "hi_cores": hi,
        "runs": {str(k): v for k, v in results.items()},
        "speedup": round(speedup, 3),
        "sf": sf_dir,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(scaling(sf_dir)))
    else:
        print(json.dumps(bench(sf_dir)))
