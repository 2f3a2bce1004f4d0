"""URL normalization + URL-level dedup (FineWeb's first dedup pass).

Web-scale corpora carry the same page under many URL spellings
(scheme, www., trailing slash, tracking params). Normalizing the URL
and keeping one row per normalized key is the cheapest dedup stage —
pure codegen per row plus ONE hash-groupBy shuffle, always run before
the expensive MinHash/embedding passes.

Normalization spec (applied in order, mirrored in `normalize_py` for
pytest and rendered for both SQL dialects):
  1. lowercase
  2. strip leading http:// or https://
  3. strip leading www.
  4. drop everything from the first '?' or '#' (query/fragment)
  5. strip trailing slashes
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd

S, D = sd.SPARK, sd.DUCKDB


def normalize_sql(col: str, d: str) -> str:
    e = f"lower({col})"
    for pat, repl in (
        (r"^https?://", ""),
        (r"^www\.", ""),
        (r"[?#].*$", ""),
        (r"/+$", ""),
    ):
        e = sd.regexp_replace_all(e, pat, repl, d)
    return e


def normalize_py(url: str) -> str:
    e = (url or "").lower()
    e = re.sub(r"^https?://", "", e)
    e = re.sub(r"^www\.", "", e)
    e = re.sub(r"[?#].*$", "", e)
    return re.sub(r"/+$", "", e)


def corpus_with_url_variants_sql(d: str, pages: str = "pages") -> str:
    """pages ∪ re-spelled copies (http + www. + tracking param for
    every 4th doc) — deterministic positives: each variant must
    normalize onto its source row."""
    return (
        f"SELECT doc_id, url FROM {pages} "
        f"UNION ALL "
        f"SELECT doc_id + 5000000 AS doc_id, "
        f"'http://www.' || substr(url, 9) || '/?utm_source=feed' AS url "
        f"FROM {pages} WHERE doc_id % 4 = 0"
    )


def with_norm_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("norm_url", F.expr(normalize_sql(url_col, S)))


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(norm_url, keeper_doc_id, n_copies): one keeper per normalized
    URL — two-phase partial agg, same scale shape as exact_dedup."""
    return (
        with_norm_url(df, url_col)
        .groupBy("norm_url")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def url_dedup_oracle_sql(d: str, pages_select: str) -> str:
    corpus = corpus_with_url_variants_sql(d)
    return f"""
WITH pages AS ({pages_select}),
corpus AS ({corpus})
SELECT {normalize_sql("url", d)} AS norm_url,
       min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies
FROM corpus GROUP BY 1
""".strip()
