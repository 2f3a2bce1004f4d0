"""URL normalization + URL-level dedup (FineWeb's first dedup pass).

Web-scale corpora carry the same page under many URL spellings
(scheme, www., trailing slash, tracking params). Normalizing the URL
and keeping one row per normalized key is the cheapest dedup stage —
pure codegen per row plus ONE hash-groupBy shuffle, always run before
the expensive MinHash/embedding passes.

Normalization spec (applied in order, mirrored in `normalize_py` for
pytest and rendered for both SQL dialects):
  1. lowercase
  2. strip the maximal leading run of scheme/www prefixes — the
     repeated alternation ((https?://)|(www\\.))+ so degenerate
     spellings like "www.www." or "http://www.http://" still reach a
     fixed point in one pass (plain sequential stripping is NOT
     idempotent on those; found by the hypothesis property test)
  3. drop everything from the first '?' or '#' (query/fragment) —
     [\\s\\S]* not .* so a newline smuggled into the query string
     (crawler garbage) can't survive the cut
  4. strip trailing slashes
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
        (r"^((https?://)|(www\.))+", ""),
        (r"[?#][\s\S]*", ""),
        (r"/+$", ""),
    ):
        e = sd.regexp_replace_all(e, pat, repl, d)
    return e


def normalize_py(url: str) -> str:
    e = (url or "").lower()
    e = re.sub(r"^((https?://)|(www\.))+", "", e)
    e = re.sub(r"[?#][\s\S]*", "", e)
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

# ---------------------------------------------------------------------------
# Recency keeper: the RE-CRAWL semantics (keep the newest capture)
# ---------------------------------------------------------------------------

def recrawl_feed_sql(d: str, pages: str = "pages") -> str:
    """pages ∪ a one-day-later re-crawl of every 4th URL (same url,
    fresher warc_ts, new doc_id) — the newer capture must win each
    normalized key. `+ INTERVAL 1 DAY` parses in both dialects."""
    return (
        f"SELECT doc_id, url, warc_ts FROM {pages} "
        f"UNION ALL "
        f"SELECT doc_id + 5000000 AS doc_id, url, "
        f"warc_ts + INTERVAL 1 DAY AS warc_ts "
        f"FROM {pages} WHERE doc_id % 4 = 0"
    )


def url_dedup_latest(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(norm_url, last_ts, keeper_doc_id, n_copies): per normalized
    URL keep the NEWEST capture (crawl-recency policy — what a
    CommonCrawl refresh actually wants), ties broken by max doc_id.

    max(struct(warc_ts, doc_id)) is an ordinary partial-aggregable
    max — ONE two-phase agg (Spark plans struct-max as SortAggregate,
    but the partial/final split still combines map-side, so only one
    row per key crosses the shuffle). The window-row_number
    formulation of the same policy shuffles EVERY row to its group
    before discarding all but one."""
    return (
        with_norm_url(df, url_col)
        .groupBy("norm_url")
        .agg(
            F.max(F.struct("warc_ts", "doc_id")).alias("__m"),
            F.count("*").alias("n_copies"),
        )
        .select(
            "norm_url",
            F.col("__m.warc_ts").alias("last_ts"),
            F.col("__m.doc_id").alias("keeper_doc_id"),
            "n_copies",
        )
    )


def url_dedup_latest_oracle_sql(d: str, pages_select: str) -> str:
    """Oracle states the policy as a window rank (clarity over speed):
    newest warc_ts, then highest doc_id, wins."""
    feed = recrawl_feed_sql(d)
    return f"""
WITH pages AS ({pages_select}),
feed AS ({feed}),
keyed AS (
  SELECT doc_id, warc_ts, {normalize_sql("url", d)} AS norm_url FROM feed
),
ranked AS (
  SELECT norm_url, warc_ts, doc_id,
         row_number() OVER (PARTITION BY norm_url
                            ORDER BY warc_ts DESC, doc_id DESC) AS rn,
         count(*) OVER (PARTITION BY norm_url) AS n_copies
  FROM keyed
)
SELECT norm_url, warc_ts AS last_ts, doc_id AS keeper_doc_id,
       CAST(n_copies AS BIGINT) AS n_copies
FROM ranked WHERE rn = 1
""".strip()


# ---------------------------------------------------------------------------
# URL template mining: crawl-trap / faceted-nav detection
# ---------------------------------------------------------------------------

TEMPLATE_TOP_K = 3
_PATH_RE = "https?://[^/]+(/[^?#]*)"


def url_templates(pages: DataFrame, top_k: int = TEMPLATE_TOP_K) -> DataFrame:
    """(host, template, n, rk): the top-k URL path templates per host,
    digit runs collapsed to '<d>' — the crawl-ops report that surfaces
    calendar traps, pagination explosions, and faceted-nav loops
    (one template carrying most of a host's URLs = a trap, not
    content). Pure codegen extraction + two-phase count; the top-k
    window ranks a (host, template)-sized relation."""
    from pyspark.sql import Window

    from . import blocklist

    t = blocklist.with_host(pages).select(
        "host",
        F.expr(
            sd.regexp_replace_all(
                f"regexp_extract(url, '{_PATH_RE}', 1)", "[0-9]+", "<d>", sd.SPARK
            )
        ).alias("template"),
    )
    counts = t.groupBy("host", "template").agg(F.count("*").alias("n"))
    w = Window.partitionBy("host").orderBy(
        F.col("n").desc(), F.col("template").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select("host", "template", "n", F.col("rk").cast("bigint").alias("rk"))
    )


def url_templates_oracle_sql(
    d: str, pages_select: str, top_k: int = TEMPLATE_TOP_K
) -> str:
    from . import blocklist

    tmpl = sd.regexp_replace_all(
        f"regexp_extract(url, '{_PATH_RE}', 1)", "[0-9]+", "<d>", d
    )
    return f"""
WITH pages AS ({pages_select}),
t AS (
  SELECT {blocklist.host_sql("url", d)} AS host, {tmpl} AS template
  FROM pages
),
counts AS (
  SELECT host, template, CAST(count(*) AS BIGINT) AS n
  FROM t GROUP BY host, template
),
ranked AS (
  SELECT host, template, n,
         row_number() OVER (PARTITION BY host ORDER BY n DESC, template ASC) AS rk
  FROM counts
)
SELECT host, template, n, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {top_k}
""".strip()
