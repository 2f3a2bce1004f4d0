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
