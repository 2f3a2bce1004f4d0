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
