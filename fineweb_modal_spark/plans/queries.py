"""Gate-query registry: every operator as (Spark callable, DuckDB oracle).

Each entry exercises one row of the SURVEY.md §2 operator inventory.
The Spark side is the engine's own DataFrame-API operators; the
oracle side is independent ANSI SQL rendered for DuckDB from the same
spec constants. Column names and rounding are aligned on both sides
because the driver's compare hashes values after sorting columns by
name (__spark_entry__ contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..operators import quality, scrub, topk
from ..sources import pages as pages_mod
from ..sources.tables import load_table
from ..spec import quality_rules as qr

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    return dict(_ORACLES)


D = sd.DUCKDB
_R6 = sd.round6


# ---------------------------------------------------------------------------
# Quality-filter stage (north rule; generalizes reference filter.py:50)
# ---------------------------------------------------------------------------


@register("quality_signals", quality.signals_sql(D))
def q_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc heuristic signals (P1/P2/P10 family, SURVEY §2.2)."""
    docs = load_table(spark, sf_dir, "documents")
    s = quality.with_signals(docs)
    return s.select(
        "doc_id",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("digit_ratio", 6).alias("digit_ratio"),
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
    )


@register("quality_keep", quality.keep_sql(D))
def q_quality_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep/drop + reason (unconditioned stopword rule variant)."""
    docs = load_table(spark, sf_dir, "documents")
    return quality.with_keep(quality.with_signals(docs)).select(
        "doc_id", "keep", "drop_reason"
    )


@register(
    "filter_short_docs",
    f"SELECT doc_id, n_words FROM ({quality.signals_sql(D, round_out=False)}) WHERE n_words > 50",
)
def q_filter_short_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — the reference's namesake predicate (filter.py:50),
    chunk_token_count > 50 generalized to document word count."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        quality.with_signals(docs)
        .filter(F.col("n_words") > 50)
        .select("doc_id", "n_words")
    )


# ---------------------------------------------------------------------------
# Aggregations (A1/A2/A3, reference summary.py:49-84)
# ---------------------------------------------------------------------------

_SUMMARY_ORACLE = f"""
SELECT source,
       count(*) AS n_docs,
       sum(n_chars) AS sum_chars,
       sum(CASE WHEN n_words < 2 THEN 1 ELSE 0 END) AS n_under2,
       sum(CASE WHEN n_words < 10 THEN 1 ELSE 0 END) AS n_under10,
       sum(CASE WHEN n_words < 50 THEN 1 ELSE 0 END) AS n_under50
FROM (SELECT source, n_chars, {sd.n_words_sql('text', D)} AS n_words FROM documents)
GROUP BY source
"""


@register("summary_by_source", _SUMMARY_ORACLE)
def q_summary_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 per-group summary + P2 threshold counts (summary.py:49-56).
    Catalyst runs it as partial+final agg — the reference's manual
    per-file dict + driver rollup (summary.py:69-84) in one plan."""
    docs = load_table(spark, sf_dir, "documents")
    s = quality.with_signals(docs)
    return s.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.when(F.col("n_words") < 2, 1).otherwise(0)).alias("n_under2"),
        F.sum(F.when(F.col("n_words") < 10, 1).otherwise(0)).alias("n_under10"),
        F.sum(F.when(F.col("n_words") < 50, 1).otherwise(0)).alias("n_under50"),
    )


@register("lang_counts", "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang")
def q_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 value_counts (top10reduce.py:79)."""
    return (
        load_table(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Top-K per feature (O2/O3/O4 — top10map.py + top10reduce.py as one query)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
WITH e AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS feature,
         unnest(embedding) AS activation
  FROM embeddings
), r AS (
  SELECT feature, vec_id, CAST(activation AS DOUBLE) AS activation,
         row_number() OVER (PARTITION BY feature ORDER BY activation DESC, vec_id ASC) AS rank
  FROM e
)
SELECT feature, vec_id, round(activation, 6) AS activation, rank
FROM r WHERE rank <= 10
"""


@register("topk_per_feature", _TOPK_ORACLE)
def q_topk_per_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    t = topk.topk_per_feature(emb, k=10)
    return t.select(
        "feature", "vec_id", F.round("activation", 6).alias("activation"), "rank"
    )


# ---------------------------------------------------------------------------
# Joins (J1 — embedding↔doc equi-join; lancer.py:102-135)
# ---------------------------------------------------------------------------

_JOIN_ORACLE = """
SELECT d.doc_id, d.source, e.label,
       round(sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS emb_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
"""


@register("docs_embeddings_join", _JOIN_ORACLE)
def q_docs_embeddings_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the reference's positional npy↔parquet alignment
    (embed-tei.py:326-329; lancer.py:102-135) as an explicit equi-join;
    plus the array-fold L2 norm (§2.8 scalar surface)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    joined = docs.join(emb, docs.doc_id == emb.vec_id, "inner")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    return joined.select(
        "doc_id", "source", "label", F.round(norm, 6).alias("emb_norm")
    )


# ---------------------------------------------------------------------------
# Sorts / limits (O5 — sort desc + head; small_sample.ipynb)
# ---------------------------------------------------------------------------


@register(
    "top100_longest",
    "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 100",
)
def q_top100_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: TakeOrderedAndProject physical top-k, not a full sort."""
    return (
        load_table(spark, sf_dir, "documents")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# Point / list / range predicates (P3/P4/P5)
# ---------------------------------------------------------------------------


@register("point_lookup", "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42")
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == 42)
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "in_list_filter",
    "SELECT doc_id, lang FROM documents WHERE doc_id IN (1,2,3,5,8,13,21,34)",
)
def q_in_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([1, 2, 3, 5, 8, 13, 21, 34]))
        .select("doc_id", "lang")
    )


@register(
    "range_filter",
    "SELECT doc_id, n_chars FROM documents WHERE n_chars > 300",
)
def q_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 300)
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# Scrub stage (north rule) over the derived pages text
# ---------------------------------------------------------------------------

_SCRUB_ORACLE = (
    f"SELECT doc_id, {scrub.scrub_sql(f'({pages_mod.TEXT_SQL})', D)} AS scrubbed_text "
    "FROM documents"
)


@register("scrub_text", _SCRUB_ORACLE)
def q_scrub_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII + toxicity scrub chain on the pages text (byte-identical
    contract per url; BASELINE.json input_hint)."""
    p = pages_mod.load_pages(spark, sf_dir, with_html=False)
    return scrub.with_scrubbed(p).select("doc_id", "scrubbed_text")


# ---------------------------------------------------------------------------
# Events: windowed agg + sessionization (streaming-shaped batch queries)
# ---------------------------------------------------------------------------

_EVENTS_WINDOW_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


@register("events_hourly", _EVENTS_WINDOW_ORACLE)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


_SESSION_ORACLE = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events, min(ts) AS session_start
FROM s GROUP BY user_id, session_id
"""


@register("sessionize", _SESSION_ORACLE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap cumsum (30-min gap)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    s = g.withColumn("session_id", F.sum("is_new").over(cum))
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"), F.min("ts").alias("session_start")
    )


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy) — training-data toolbox
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = """
SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


@register("dedup_exact", _DEDUP_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 hash-groupBy, min-id representative."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# Chunker UDTF (U1) — gate-checked via the closed-form chunk count
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = f"""
SELECT doc_id,
       CASE WHEN n_words <= 500 THEN 1
            ELSE CAST(floor((n_words - 50.0) / 450.0) AS INT) + 1 END AS n_chunks
FROM (SELECT doc_id, {sd.n_words_sql("repeat(text || ' ', 20)", D)} AS n_words FROM documents)
"""


@register("chunk_counts", _CHUNK_ORACLE)
def q_chunk_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 flagship UDTF: run the real mapInPandas chunker on ×20
    repeated text (so windows actually split) and count chunks per doc;
    the oracle is the closed-form window count implied by
    chunker.py:77-95 semantics incl. the ≥OVERLAP tail rule."""
    from ..operators.chunker import chunk_documents

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.repeat(F.concat("text", F.lit(" ")), 20).alias("text")
    )
    chunks = chunk_documents(docs, id_col="doc_id", keep_cols=())
    return chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
