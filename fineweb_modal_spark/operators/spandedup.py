"""Exact substring-level dedup: duplicated token-window spans.

The remaining dedup granularity the toolbox lacked: MinHash/SimHash
find near-duplicate DOCUMENTS, the boilerplate screen finds hot short
shingles — this finds exact repeated SUBSTRINGS (the Lee et al.
"Deduplicating Training Data Makes Language Models Better" pass,
suffix-array semantics approximated at token-window granularity): any
run of >= SPAN_W tokens that occurs more than once in the corpus is
reported as a per-document token-range span, ready for excision.

Plan (scale-first):
  1. per-row window hashes — `shingles(n=SPAN_W)` staged-column folds,
     one md5 per window, zero shuffle (same cost class as the MinHash
     shingle stage, W/n_shingle ≈ 10× the hashing work);
  2. posexplode → global occurrence count per hash — ONE map-side-
     combinable partial agg on (h)-keyed 16-byte rows; text never
     shuffles;
  3. hashes with >= 2 occurrences (a vanishing fraction of a clean
     corpus) broadcast back over the window relation — clean rows die
     at the semi-probe, so step 4 touches only duplicated windows;
  4. island merge per doc: consecutive duplicated window positions
     (pos - row_number() constant) collapse into [span_start,
     span_end] token ranges — a window agg over the tiny dup set.

A duplicated L-token run yields L-W+1 consecutive windows, merging to
one span of exactly L tokens — the excisable range is recovered, not
just a flag. All fragments render identically for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..spec import hashing as H

S = H.SPARK

SPAN_W = 30  # minimum duplicated run length, in tokens


def _windows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h): every SPAN_W-token window hash, 1-based pos.
    Docs shorter than SPAN_W tokens yield their single all-tokens
    window (shingles() short-doc rule) — an exact short doc dup is
    still a dup."""
    from ..functions.parallelism import ensure_parallelism

    toks = H.tokens_lower("text", S)
    sh = H.shingles("__toks", S, n=SPAN_W)
    shh = H.shingle_hashes("__sh", S)
    return (
        ensure_parallelism(docs)
        .selectExpr("doc_id", f"{toks} AS __toks")
        .selectExpr("doc_id", f"{sh} AS __sh")
        .selectExpr("doc_id", f"{shh} AS hs")
        .select("doc_id", F.posexplode("hs").alias("pos", "h"))
        .withColumn("pos", F.col("pos") + 1)
    )


def duplicated_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows): merged token ranges
    (1-based, inclusive) covered by duplicated >= SPAN_W-token runs."""
    win = _windows(docs)
    dup_h = (
        win.groupBy("h")
        .agg(F.count("*").alias("occ"))
        .where(F.col("occ") >= 2)
        .select("h")
    )
    dup = win.join(F.broadcast(dup_h), "h", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    island = dup.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    return (
        island.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(SPAN_W - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .drop("island")
    )


def planted_corpus_sql(d: str, table: str = "documents") -> str:
    """documents ∪ planted partial copies: every 20th doc contributes
    a doc at id+3000000 whose text is its tokens 10..69 (a 60-token
    exact repeat) plus a unique tail — deterministic span positives,
    the house corpus_with_near_dups pattern. Word-soup fixtures can't
    produce a natural 30-token exact repeat, so output = planted spans
    exactly."""
    toks = H.tokens_lower("text", d)
    if d == S:
        copied = f"array_join(slice({toks}, 10, 60), ' ')"
    else:
        copied = f"list_aggregate({toks}[10:69], 'string_agg', ' ')"
    return (
        f"SELECT doc_id, text FROM {table} "
        f"UNION ALL "
        f"SELECT doc_id + 3000000 AS doc_id, "
        f"{copied} || ' zzqq unique tail marker ' || CAST(doc_id AS "
        f"{'STRING' if d == S else 'VARCHAR'}) AS text "
        f"FROM {table} WHERE doc_id % 20 = 0"
    )


def duplicated_spans_oracle_sql(d: str, table: str) -> str:
    toks = H.tokens_lower("text", d)
    sh = H.shingles("__toks", d, n=SPAN_W)
    shh = H.shingle_hashes("__sh", d)
    inner = (
        f"(SELECT doc_id, {shh} AS hs FROM "
        f"(SELECT doc_id, {sh} AS __sh FROM "
        f"(SELECT doc_id, {toks} AS __toks FROM {table})))"
    )
    if d == S:
        win = (
            f"SELECT doc_id, pos + 1 AS pos, h FROM {inner} "
            f"LATERAL VIEW posexplode(hs) AS pos, h"
        )
    else:
        win = (
            f"SELECT doc_id, u.pos, u.h FROM {inner}, "
            f"LATERAL (SELECT unnest(hs) AS h, generate_subscripts(hs, 1) AS pos) u"
        )
    return f"""
WITH win AS ({win}),
dup_h AS (SELECT h FROM (SELECT h, count(*) AS occ FROM win GROUP BY h)
          WHERE occ >= 2),
dup AS (SELECT doc_id, pos FROM win WHERE h IN (SELECT h FROM dup_h)),
island AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM dup
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {SPAN_W - 1} AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_windows
FROM island GROUP BY doc_id, isl
""".strip()
