"""Invariants of the bench harness's corpus-size materializer.

The size-scaling and incremental-scaling measurements are only honest
if the replicated corpus models a GROWING crawl: every replica
textually distinct (constant duplicate rate, not 32 exact copies per
doc), per-doc work identical at both sizes (rep tags applied
uniformly, including rep 0), ids collision-free. A silent break here
would skew SIZE_SCALING/INCR_SCALING without failing any gate — so
pin it.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.001"


def test_materialize_sized_models_growing_crawl(spark, tmp_path):
    from bench import _materialize_sized

    reps = 3
    out = str(tmp_path / "sized")
    n = _materialize_sized(spark, SF, reps, out)
    docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
    base = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n_base = base.count()

    assert n == reps * n_base == docs.count()
    # ids collision-free across replicas
    assert docs.select("doc_id").distinct().count() == n
    # every replica textually DISTINCT: no text appears twice unless
    # the base corpus itself carries that duplicate (rep tags make
    # cross-rep copies differ)
    base_max_dup = (
        base.groupBy("text").count().agg(F.max("count")).first()[0]
    )
    sized_max_dup = (
        docs.groupBy("text").count().agg(F.max("count")).first()[0]
    )
    assert sized_max_dup == base_max_dup
    # rep tags applied uniformly INCLUDING rep 0 (so per-doc work is
    # identical at x1 and xN): every word of every doc is tagged
    untagged = docs.where(
        F.exists(
            F.split("text", " "),
            lambda w: (F.length(w) > 0) & ~w.rlike("^r[0-9]+"),
        )
    ).count()
    assert untagged == 0
    # derived columns stay consistent with the rewritten text
    bad_len = docs.where(F.col("n_chars") != F.length("text")).count()
    assert bad_len == 0

    emb = spark.read.parquet(os.path.join(out, "embeddings.parquet"))
    n_emb_base = spark.read.parquet(
        os.path.join(SF, "embeddings.parquet")
    ).count()
    assert emb.count() == reps * n_emb_base
    assert emb.select("vec_id").distinct().count() == reps * n_emb_base


def test_compact_bench_line_fits_driver_tail_budget():
    """BENCH_r04.json shipped `parsed: null`: the embedded scaling
    blocks pushed the bench line past the driver's ~2.26 KB stdout
    tail capture. The compact line (printed LAST by bench.py) must
    stay under budget with the FULL query table, the acceptance F1,
    registry counts, and the honest scaling attempt distribution."""
    import json

    import bench

    full = {
        "metric": "headline_queries_wall_sec",
        "value": 39.0,
        "unit": "sec",
        # worst case: every headline query present with a wide value
        "queries": {n: 123.456 for n in bench.HEADLINE},
        "sf": "/root/testdata/sf0.1",
        "n_docs": 50000,
        "pipeline_docs_per_sec": 4296.1,
        "keep_drop_f1": {
            "acceptance_predictor": "trained_gd",
            "acceptance_f1": 0.9912,
            "per_predictor": {"trained_gd": 0.9912, "frozen_logistic": 0.97},
        },
        "registry_queries": 208,
        "registry_oracled": 207,
        "scaling": bench._latest_scaling(),
    }
    out = bench.compact_line(full)
    line = json.dumps(out)
    assert len(line) <= bench.COMPACT_BUDGET, len(line)
    assert out["queries"] == full["queries"]
    assert out["keep_drop_f1"] == 0.9912
    assert out["registry_queries"] == 208
    # the honest spread rides along (ask #6): committed SCALING.json
    # always has attempts, so the summary must be present
    assert out["scaling"]["selection_policy"] == "best_of_attempts"
    s = out["scaling"]["attempts_summary"]
    assert {"n", "min", "median", "max", "n_ge_0.8"} <= set(s)
    # and the line parses back
    assert json.loads(line)["scaling"]["attempts_summary"]["n"] == s["n"]
