"""Text-analysis operators: token counting + document fingerprinting.

Token counting uses a BPE-ish regex (letter runs / digits /
punctuation marks — spec/hashing.py BPE_TOKEN_RE) alongside plain
whitespace counts; fingerprints are rolling polynomial hashes over
md5-hashed tokens. All pure column expressions (whole-stage codegen),
shared fragment-for-fragment with the DuckDB oracle.

Reference analog: token_count derived columns
(small_sample.ipynb cells 16-19) and the tokenize surface of
chunker.py:76 — recast as JVM-side expressions instead of per-row
tokenizer calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..spec import hashing as H

S = H.SPARK


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n_ws_tokens (whitespace) + n_bpe_tokens (regex) per document."""
    return docs.withColumn(
        "n_ws_tokens", F.expr(sd.n_words_sql(text_col, S))
    ).withColumn("n_bpe_tokens", F.expr(H.bpe_token_count(text_col, S)))


def token_counts_sql(d: str, table: str = "documents", text_col: str = "text") -> str:
    return (
        f"SELECT doc_id, {sd.n_words_sql(text_col, d)} AS n_ws_tokens, "
        f"{H.bpe_token_count(text_col, d)} AS n_bpe_tokens FROM {table}"
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit-safe rolling-hash fingerprint over lowercased tokens."""
    toks = H.tokens_lower(text_col, S)
    return docs.withColumn("fingerprint", F.expr(H.fingerprint_expr(toks, S)))


def fingerprint_sql(d: str, table: str = "documents", text_col: str = "text") -> str:
    toks = H.tokens_lower(text_col, d)
    return (
        f"SELECT doc_id, {H.fingerprint_expr(toks, d)} AS fingerprint FROM {table}"
    )


def corpus_diversity(pages: DataFrame) -> DataFrame:
    """(lang, n_docs, n_hosts, inv_simpson r6): effective number of
    hosts per language — the domain-diversity KPI a curator tracks so
    a language's corpus is not secretly three domains. inv_simpson =
    n_docs² / Σ cnt_h² (inverse Simpson index): both operands are
    EXACT integers (order-free sums), so the one double division is
    bit-identical across engines. BIGINT bound: safe to ~3e9 docs per
    host (cnt² < 2^63) — beyond that, widen to DECIMAL.

    Scale shape: two chained partial aggs ((lang,host) then lang) —
    host-cardinality intermediate, no corpus re-shuffle."""
    from . import blocklist

    per_host = (
        blocklist.with_host(pages)
        .groupBy("lang", "host")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_host.groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_docs"),
            F.count("*").alias("n_hosts"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"),
        )
        .select(
            "lang",
            "n_docs",
            "n_hosts",
            F.round(
                (F.col("n_docs") * F.col("n_docs")).cast("double")
                / F.col("sumsq").cast("double"),
                6,
            ).alias("inv_simpson"),
        )
    )


def diversity_oracle_sql(d: str, pages_select: str) -> str:
    from . import blocklist

    return f"""
WITH pages AS ({pages_select}),
per_host AS (
  SELECT lang, {blocklist.host_sql("url", d)} AS host,
         CAST(count(*) AS BIGINT) AS cnt
  FROM pages GROUP BY lang, {blocklist.host_sql("url", d)}
)
SELECT lang,
       CAST(sum(cnt) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_hosts,
       round(CAST(sum(cnt) * sum(cnt) AS DOUBLE) / CAST(sum(cnt * cnt) AS DOUBLE), 6)
         AS inv_simpson
FROM per_host GROUP BY lang
""".strip()


# ---------------------------------------------------------------------------
# Script-mismatch report: encoding/mojibake detection via char scripts
# ---------------------------------------------------------------------------

_CJK_PAT = "[一-鿿㐀-䶿]"  # same range the langid spec uses
_LATIN_PAT = "[a-zA-Z]"
CJK_MIN_FOR_ZH = 0.02  # claimed zh with less CJK than this -> mismatch
# (fixture zh pages carry ~3.7% CJK marker mass; genuine zh passes)
CJK_MAX_FOR_NON_ZH = 0.30  # claimed non-zh with more -> mismatch


def _script_count(col: str, pat: str, d: str) -> str:
    return f"(length({col}) - length({sd.regexp_replace_all(col, pat, '', d)}))"


def script_report(pages: DataFrame) -> DataFrame:
    """(doc_id, lang, cjk_ratio r6, latin_ratio r6, script_mismatch):
    character-script composition vs the claimed language — the cheap
    detector for mojibake, mislabeled metadata, and double-encoded
    text that no token-level rule sees. Pure codegen (two char-class
    deletion counts per row), zero shuffle."""
    text = F.coalesce(F.col("text"), F.lit(""))
    ln = F.length(text)
    cjk = F.expr(_script_count("text", _CJK_PAT, S))
    lat = F.expr(_script_count("text", _LATIN_PAT, S))
    cjk_r = F.when(ln > 0, cjk.cast("double") / ln).otherwise(F.lit(0.0))
    lat_r = F.when(ln > 0, lat.cast("double") / ln).otherwise(F.lit(0.0))
    mismatch = F.when(
        F.col("lang") == "zh", cjk_r < F.lit(CJK_MIN_FOR_ZH)
    ).otherwise(cjk_r > F.lit(CJK_MAX_FOR_NON_ZH))
    return pages.select(
        "doc_id",
        "lang",
        F.round(cjk_r, 6).alias("cjk_ratio"),
        F.round(lat_r, 6).alias("latin_ratio"),
        mismatch.alias("script_mismatch"),
    )


def script_report_sql(d: str, pages_select: str) -> str:
    cjk = _script_count("text", _CJK_PAT, d)
    lat = _script_count("text", _LATIN_PAT, d)
    cjk_r = f"CASE WHEN length(text) > 0 THEN CAST({cjk} AS DOUBLE) / length(text) ELSE 0.0 END"
    lat_r = f"CASE WHEN length(text) > 0 THEN CAST({lat} AS DOUBLE) / length(text) ELSE 0.0 END"
    return f"""
WITH pages AS ({pages_select}),
coalesced AS (SELECT doc_id, lang, coalesce(text, '') AS text FROM pages)
SELECT doc_id, lang,
       round({cjk_r}, 6) AS cjk_ratio,
       round({lat_r}, 6) AS latin_ratio,
       CASE WHEN lang = 'zh' THEN ({cjk_r}) < {CJK_MIN_FOR_ZH}
            ELSE ({cjk_r}) > {CJK_MAX_FOR_NON_ZH} END AS script_mismatch
FROM coalesced
""".strip()
