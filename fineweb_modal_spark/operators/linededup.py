"""C4/CCNet-style cross-document line-level dedup.

Web pages share whole LINES across documents — cookie banners,
"share this" bars, nav footers — that survive URL dedup (different
pages) and MinHash (documents are mostly distinct). C4's cleanup and
CCNet's paragraph dedup remove any line whose corpus-wide document
frequency crosses a threshold, then reassemble the remaining lines in
original order. The reference stops at chunking/embedding
(fineweb-modal chunker.py); this extends the training-data toolbox
the same way dedup.py / decontam.py do.

Spec (mirrored in the DuckDB oracle rendering):
  * lines     = split(text, '\\n')
  * blank     = ws_trim(line) == ''  -> dropped, counted in neither
                n_kept nor n_removed
  * key       = md5_i64('ld:' || lower(ws_trim(line)))
  * df(key)   = number of DISTINCT documents containing the key
  * removed   iff df >= MIN_LINE_DF
  * clean_text = kept lines joined with '\\n' in original order
                 ('' when every line is removed — caller decides
                 whether empty docs are then dropped)

100-TB plan shape (why the engine does NOT naively explode text):
  1. per-doc DISTINCT line keys as a row-local array (array_distinct)
     -> explode keys only -> one map-side-combinable count(*) agg;
     count(*) IS document frequency because keys are pre-distinct
     per document. Text never enters this shuffle.
  2. (doc_id, pos, key) triples -> shuffle join against the high-df
     key set (the boilerplate-line set at web scale is far too large
     to broadcast — df>=3 over 10^12 docs is ~10^9 keys; AQE may
     still downgrade to broadcast at small SF).
  3. matched triples -> groupBy doc_id -> collect positions: ONLY the
     removed positions flow, as ints.
  4. one doc_id join of the original docs against their bad-position
     arrays, then a row-local rebuild (filter + array_join). The text
     column crosses the wire exactly once, in this join.

Every fragment below renders identically in Spark SQL and DuckDB;
the Catalyst HOF arrays are staged as columns first (lambda-inlining
re-evaluates array subexpressions per element otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..spec import hashing as H

S, D = sd.SPARK, sd.DUCKDB

MIN_LINE_DF = 3


def line_key_sql(line: str, d: str) -> str:
    """Portable 60-bit key of a normalized (trimmed, lowered) line."""
    return H.md5_i64(f"'ld:' || lower({sd.ws_trim(line, d)})", d)


def _pl_expr(d: str = S) -> str:
    """(line, pos) structs of the NON-BLANK lines of __lines."""
    return (
        "filter(transform(__lines, (l, i) -> struct(l AS line, i AS pos)),"
        f" s -> length({sd.ws_trim('s.line', d)}) > 0)"
    )


def _with_pl(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "__lines", F.split("text", "\n")
    ).withColumn("__pl", F.expr(_pl_expr()))


def boiler_line_keys(docs: DataFrame, min_df: int = MIN_LINE_DF) -> DataFrame:
    """(lkey) relation of lines whose document frequency >= min_df.

    Keys are distinct per document BEFORE the explode, so the df agg
    is a plain count(*) — fully map-side combinable, no
    count(DISTINCT) shuffle amplification, and text never shuffles.
    """
    keys = _with_pl(docs).select(
        F.explode(
            F.array_distinct(
                F.expr(f"transform(__pl, s -> {line_key_sql('s.line', S)})")
            )
        ).alias("lkey")
    )
    return (
        keys.groupBy("lkey")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .select("lkey")
    )


def line_dedup(docs: DataFrame, min_df: int = MIN_LINE_DF) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_removed): corpus-frequent lines
    removed from every document, survivors rejoined in order.

    Only (doc_id, pos, key) int triples meet the boilerplate set in
    the key join, and only REMOVED positions flow through the
    per-doc agg; the text column is shuffled exactly once (the final
    doc_id join).
    """
    boiler = boiler_line_keys(docs, min_df)
    staged = _with_pl(docs)
    triples = staged.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(__pl, s -> "
                f"struct(s.pos AS pos, {line_key_sql('s.line', S)} AS lkey))"
            )
        ).alias("pk"),
    ).select("doc_id", "pk.pos", "pk.lkey")
    bad_pos = (
        triples.join(boiler, "lkey")
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("__bad"))
    )
    rebuilt = (
        staged.join(bad_pos, "doc_id", "left")
        .withColumn(
            "__kept",
            F.expr(
                "filter(__pl, s -> __bad IS NULL"
                " OR NOT array_contains(__bad, s.pos))"
            ),
        )
        .select(
            "doc_id",
            F.array_join(
                F.expr("transform(__kept, s -> s.line)"), "\n"
            ).alias("clean_text"),
            F.size("__kept").cast("long").alias("n_kept"),
            (F.size("__pl") - F.size("__kept")).cast("long").alias(
                "n_removed"
            ),
        )
    )
    return rebuilt


# ---------------------------------------------------------------------------
# Deterministic lined corpus + oracle (fixture text has no newlines)
# ---------------------------------------------------------------------------

def lined_corpus_sql(d: str, table: str = "documents") -> str:
    """documents re-lined with planted cross-document lines:
    a cookie banner (df ~ n/2, removed), a share bar (df ~ n/5,
    removed), 13 per-host footers (df ~ n/13 each, removed), a
    whitespace-only line (blank, silently dropped), a "limited offer"
    line shared by exactly the 2 docs of a pair (df <= 2 < MIN_LINE_DF,
    KEPT), and the doc's own unique body (df = 1, kept). concat_ws
    skips NULL branches in both dialects; (doc_id - doc_id % 2) keeps
    the pair key in integer arithmetic (a double division would round
    differently across engines)."""
    nl = "chr(10)"
    return f"""
SELECT doc_id, concat_ws({nl},
  CASE WHEN doc_id % 2 = 0 THEN 'Please accept cookies to continue' END,
  CASE WHEN doc_id % 4 = 0 THEN '   ' END,
  text,
  CASE WHEN doc_id % 5 = 0 THEN 'Share this page on FaceSpace' END,
  CASE WHEN doc_id % 997 < 2 THEN 'limited offer ' || CAST(doc_id - doc_id % 2 AS STRING) END,
  'Footer of host h' || CAST(doc_id % 13 AS STRING)) AS text
FROM {table}
""".strip()


def rebuild_select_sql(
    d: str, src: str, min_df: int = MIN_LINE_DF
) -> str:
    """DuckDB SELECT producing (doc_id, clean_text, n_kept, n_removed)
    from a (doc_id, text) relation `src` — the whole line-dedup spec
    as composable SQL. Parallel unnests zip (line, pos); the FILTERed
    ordered string_agg rebuilds clean_text; df counted over per-doc
    DISTINCT keys exactly like the engine."""
    key = line_key_sql("line", d)
    trimmed = sd.ws_trim("line", d)
    return f"""
WITH __ld_exploded AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
  FROM {src}
),
__ld_lines AS (
  SELECT doc_id, pos, line, {key} AS lkey
  FROM __ld_exploded WHERE length({trimmed}) > 0
),
__ld_boiler AS (
  SELECT lkey FROM (SELECT DISTINCT doc_id, lkey FROM __ld_lines)
  GROUP BY lkey HAVING count(*) >= {min_df}
),
__ld_flagged AS (
  SELECT l.doc_id, l.pos, l.line,
         (l.lkey IN (SELECT lkey FROM __ld_boiler)) AS is_boiler
  FROM __ld_lines l
)
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                FILTER (WHERE NOT is_boiler), '') AS clean_text,
       CAST(count(*) FILTER (WHERE NOT is_boiler) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE is_boiler) AS BIGINT) AS n_removed
FROM __ld_flagged GROUP BY doc_id
""".strip()


def line_dedup_oracle_sql(
    d: str, table: str = "documents", min_df: int = MIN_LINE_DF
) -> str:
    """Gate oracle: the rebuild over the planted lined corpus, with
    clean_text projected to its md5 (hash-friendly)."""
    return f"""
WITH lined AS ({lined_corpus_sql(d, table)}),
rebuilt AS ({rebuild_select_sql(d, "lined", min_df)})
SELECT doc_id, md5(clean_text) AS clean_md5, n_kept, n_removed
FROM rebuilt
""".strip()


def line_key_py(line: str) -> int:
    """Pure-Python mirror of line_key_sql for the differential tests."""
    import hashlib

    norm = "ld:" + (line or "").strip(sd.WS_EDGE_CHARS).lower()
    return int(hashlib.md5(norm.encode("utf-8")).hexdigest()[:15], 16)
