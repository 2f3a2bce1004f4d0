"""Corpus-hygiene operators: decontamination, boilerplate screen,
deterministic train/val/test sharding."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from fineweb_modal_spark.operators import decontam, split
from fineweb_modal_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_decontaminate_flags_planted_leaks_only(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    planted = eval_docs.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = docs.where(F.col("doc_id") % 97 != 0).unionByName(planted)
    bench = decontam.benchmark_grams(eval_docs)
    hits = {r.doc_id: r.n_hits for r in decontam.decontaminate(corpus, bench).collect()}
    planted_ids = {r.doc_id for r in planted.select("doc_id").collect()}
    # every planted leak is caught, with many shared grams each
    assert planted_ids <= set(hits)
    for pid in planted_ids:
        assert hits[pid] > 10
    # docs sharing no benchmark 8-gram are NOT flagged (natural
    # collisions are possible but must be a tiny minority)
    assert len(hits) <= len(planted_ids) + 3


def test_decontaminate_clean_corpus_empty(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bench = decontam.benchmark_grams(
        spark.createDataFrame(
            [(1, "completely disjoint benchmark vocabulary zebra quux")],
            "doc_id long, text string",
        )
    )
    assert decontam.decontaminate(docs, bench).count() == 0


def test_decontaminate_probe_is_broadcast(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bench = decontam.benchmark_grams(docs.where(F.col("doc_id") % 97 == 0))
    plan = _plan(decontam.decontaminate(docs, bench))
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_boilerplate_keep_rule_exact(spark):
    rows = decontam.boilerplate_signals(
        load_table(spark, SF, "documents").select("doc_id", "text")
    ).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_sh
        assert r.keep == (r.n_boiler * decontam.BOILER_KEEP_DEN <= r.n_sh * decontam.BOILER_KEEP_NUM)
    # with a 25-word synthetic vocabulary both classes must be populated
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < 500


def test_boilerplate_all_duplicate_docs_dropped(spark):
    # 5 identical docs + 1 unique: every shingle of the clones has df=5
    # >= BOILER_DF, so their ratio is 1.0 and they are dropped; the
    # unique doc shares nothing and is kept.
    docs = spark.createDataFrame(
        [(i, "the same cookie banner text accept all cookies now") for i in range(5)]
        + [(99, "entirely novel words appear precisely once overall here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in decontam.boilerplate_signals(docs).collect()}
    for i in range(5):
        assert got[i].boiler_ratio == 1.0 and not got[i].keep
    assert got[99].n_boiler == 0 and got[99].keep


def test_split_stable_proportioned_and_shuffle_free(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    out = split.assign_split(docs)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 8 * (counts["val"] + counts["test"])  # ~90/10
    # stable under repartition: identical assignment per doc_id
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in split.assign_split(docs.repartition(7)).collect()}
    assert a == b
    # row-local: no Exchange in the assignment plan
    assert "Exchange" not in _plan(split.assign_split(docs))


def test_collapse_repeated_lines_edges(spark):
    """Empty text, all-identical lines, and non-adjacent repeats."""
    from fineweb_modal_spark.operators import scrub

    df = spark.createDataFrame(
        [
            (1, ""),
            (2, "a\na\na\na"),
            (3, "a\nb\na\nb"),
            (4, "nav\nnav\nbody text\nfooter\nfooter"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.c
        for r in scrub.with_collapsed_lines(df, "text", "c").collect()
    }
    assert got == {
        1: "",
        2: "a",
        3: "a\nb\na\nb",
        4: "nav\nbody text\nfooter",
    }


def test_simhash_pairs_bucketing_no_false_negatives(spark):
    """The pigeonhole candidate set must contain EVERY pair within
    hamming k (cross-check against brute force on a small corpus)."""
    from fineweb_modal_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [(i, base + f"tail {i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_pairs(df, bits=48, k=3).collect()
    }
    sim = {r.doc_id: r.simhash for r in dedup.with_simhash(df, bits=48).collect()}
    want = {
        (a, b)
        for a in sim
        for b in sim
        if a < b and bin(sim[a] ^ sim[b]).count("1") <= 3
    }
    assert got == want and len(want) > 0


def test_rule_ablation_waterfall_invariants(spark):
    """The ablation table's three identities: marginal drops telescope
    the cumulative-survivor column, the final survivor count equals
    the battery's keep count, and solo >= marginal per rule (a doc
    attributed to rule i certainly fails rule i solo)."""
    from fineweb_modal_spark.operators import quality
    from fineweb_modal_spark.spec import quality_rules as qr

    docs = load_table(spark, SF, "documents")
    rows = quality.rule_ablation(docs).collect()
    assert [r.rule for r in rows] == qr.DROP_REASONS
    n_total = rows[0].n_total
    prev = n_total
    for r in rows:
        assert r.cumulative_survivors == prev - r.marginal_drops
        assert r.solo_drops >= r.marginal_drops
        prev = r.cumulative_survivors
    kept = quality.with_keep(quality.with_signals(docs)).where("keep").count()
    assert rows[-1].cumulative_survivors == kept
    # the plan is a single-row global aggregate: no per-rule rescan
    # (formatted explain names each node twice: tree + detail header)
    plan = _plan(quality.rule_ablation(docs))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_cluster_safe_split_never_straddles(spark):
    """The leakage property itself: every verified near-dup pair
    (jaccard >= threshold) lands in ONE split when the coin hashes
    the cluster keeper — and the plain id-hash split would provably
    have straddled at least one of these clusters on this corpus
    (the bug this operator exists to fix)."""
    from fineweb_modal_spark.operators import dedup

    load_table(spark, SF, "documents").createOrReplaceTempView(
        "documents"
    )
    corpus = spark.sql(dedup.corpus_with_near_dups_sql("spark"))
    pairs = dedup.lsh_pairs(corpus).where(
        F.col("jaccard") >= dedup.DEFAULT_JACCARD
    )
    clusters = dedup.resolve_clusters(pairs, corpus.select("doc_id"))
    safe = clusters.withColumn(
        "split", F.expr(split.split_expr("spark", "keeper_doc_id"))
    )
    # no cluster exposes more than one distinct split
    straddling = (
        safe.groupBy("keeper_doc_id")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert straddling == 0
    # the id-hash split WOULD have straddled >=1 multi-doc cluster here
    naive = clusters.withColumn(
        "split", F.expr(split.split_expr("spark", "doc_id"))
    )
    naive_straddling = (
        naive.groupBy("keeper_doc_id")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert naive_straddling > 0
