"""Plan-shape regression guards for the newest toolbox operators —
the scale contracts (zero shuffle / broadcast-only / no Python nodes)
that correctness hashes cannot see."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_robots_filter_is_broadcast_anti_no_shuffle(spark):
    from fineweb_modal_spark.operators import blocklist

    pages = spark.createDataFrame(
        [(1, "https://h1.example.com/p/1")], "doc_id long, url string"
    )
    rules = spark.createDataFrame(
        [("h1.example.com", "/p/1")], "r_host string, r_prefix string"
    )
    plan = _plan(blocklist.robots_filter(pages, rules))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:1500]
    assert "Exchange hashpartitioning" not in plan, plan[:1500]


def test_upsample_is_broadcast_no_shuffle(spark):
    from fineweb_modal_spark.operators import mixture

    docs = spark.createDataFrame(
        [(1, "src0")], "doc_id long, source string"
    )
    rates = spark.createDataFrame(
        [("src0", 2500)], "source string, rate_num int"
    )
    plan = _plan(mixture.upsample(docs, rates))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "Exchange hashpartitioning" not in plan, plan[:1500]


def test_semantic_decontaminate_zero_shuffle_zero_python(spark):
    from fineweb_modal_spark.operators import decontam

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    bench = emb.where("vec_id % 41 = 0")
    plan = _plan(decontam.semantic_decontaminate(emb, bench))
    assert "Exchange" not in plan, plan[:1500]
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan, plan[:1500]


def test_anchor_index_single_count_shuffle_before_window(spark):
    from fineweb_modal_spark.functions import sqldialect as sd
    from fineweb_modal_spark.operators import linkgraph

    pages = spark.createDataFrame(
        [(1, "https://h1.example.com/p/1")], "doc_id long, url string"
    )
    pages.createOrReplaceTempView("pages_ps_anchor")
    linked = spark.sql(linkgraph.linked_pages_sql(sd.SPARK, "pages_ps_anchor"))
    plan = _plan(linkgraph.anchor_text_index(linked))
    # no Python nodes anywhere; extraction + zip stay codegen
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan[:1500]
    # WindowGroupLimit partial ranking present (rank<=k pushed map-side)
    assert "WindowGroupLimit" in plan, plan[:1500]


def test_quota_sampler_uses_window_group_limit(spark):
    from fineweb_modal_spark.plans import queries as Q

    df = Q.queries()["quota_sample_per_lang"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "WindowGroupLimit" in plan, plan[:1500]


def test_ngram_lm_scoring_joins_are_broadcast(spark):
    """The model/vocab joins on the scoring path must be broadcast —
    the only hashpartitioning exchanges allowed are the two training
    aggs (tok; w1,w2) and the per-doc rollup (doc_id)."""
    from fineweb_modal_spark.operators import ngramlm

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b")], "doc_id long, text string"
    )
    plan = _plan(ngramlm.score_docs(docs))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
    import re

    keys = re.findall(r"Exchange hashpartitioning\(([a-z_0-9#]+)", plan)
    assert set(keys) <= {"tok", "w1", "doc_id"}, keys


def test_session_window_is_single_agg_no_python(spark):
    """Built-in session windows must compile to ONE hash-partition
    exchange on the session keys with native session-merge — no window
    functions, no Python stage (the whole point vs the custom op)."""
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
    )
    plan = _plan(df)
    assert plan.count("+- Exchange") == 1, plan[:2000]
    assert "MergingSessions" in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    for node in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
                 "MapInPandas"):
        assert node not in plan, plan[:2000]


def test_unpivot_is_expand_zero_extra_shuffle(spark):
    """df.unpivot lowers to an Expand node on top of the agg — the
    melt itself must not add an exchange."""
    docs = spark.createDataFrame(
        [(1, "s0", 10)], "doc_id long, source string, n_chars long"
    )
    wide = docs.groupBy("source").agg(
        F.count("*").cast("double").alias("n_docs"),
        F.max("n_chars").cast("double").alias("max_chars"),
    )
    melted = wide.unpivot("source", ["n_docs", "max_chars"], "metric", "value")
    plan = _plan(melted)
    assert "Expand" in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == _plan(wide).count(
        "Exchange hashpartitioning"
    ), plan[:2000]


def test_redirect_chains_recursion_shuffles_frontier_only(spark):
    """Each WITH RECURSIVE step joins the frontier to the narrow edge
    relation; the documents scan must be pruned to doc_id only (the
    text column never enters the loop)."""
    from fineweb_modal_spark.plans.queries import _REDIRECT_CHAINS_SQL
    from fineweb_modal_spark.sources.tables import load_table

    load_table(spark, "/root/testdata/sf0.001", "documents"
               ).createOrReplaceTempView("documents")
    plan = _plan(spark.sql(_REDIRECT_CHAINS_SQL))
    assert "UnionLoop" in plan, plan[:2000]
    import re

    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        assert "text" not in m, plan[:3000]
