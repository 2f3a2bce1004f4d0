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
