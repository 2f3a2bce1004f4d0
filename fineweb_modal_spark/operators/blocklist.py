"""URL/domain blocklist filter (FineWeb's pipeline stage 1).

FineWeb drops pages from adult/fraud/malware domains (the UT1
blocklist) BEFORE any text-quality work — it is the cheapest filter
in the whole DAG and removes content no later stage should ever pay
to tokenize. The reference corpus (fineweb-modal) consumes FineWeb
downstream of this stage; re-expressed Spark-first the stage is:

  * host extraction: pure codegen per row (lower, strip scheme/www,
    cut at the first '/');
  * the blocklist is a ~10^6-row dimension table -> F.broadcast +
    LEFT ANTI join. ZERO shuffle on the corpus at any scale; the
    filter composes with parquet column pruning (url + carried cols
    only).

Matching is exact-host by spec. (Registrable-domain suffix matching
is a policy choice layered on the same join — normalize the key to
the registrable suffix on BOTH sides; it is not exercised here
because the synthetic corpus puts every host under one registrable
domain.)

The offline stand-in for the UT1 list is derived deterministically
from the corpus itself: hosts whose md5 coin lands in 1/5 of the
space. The gate's DuckDB oracle re-derives the same list, so the
join semantics (not the particular list) are what is checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..spec import hashing as H

S, D = sd.SPARK, sd.DUCKDB

BLOCK_MOD = 5  # offline stand-in list: md5('blk:'||host) % 5 == 0


def host_sql(url: str, d: str) -> str:
    """Portable host extraction: lower -> strip scheme -> strip
    leading www. -> cut at the first '/', '?', or '#'."""
    e = f"lower({url})"
    for pat, repl in (
        (r"^https?://", ""),
        (r"^www\.", ""),
        (r"[/?#].*$", ""),
    ):
        e = sd.regexp_replace_all(e, pat, repl, d)
    return e


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("host", F.expr(host_sql(url_col, S)))


def synthetic_blocklist(hosts: DataFrame) -> DataFrame:
    """Deterministic offline stand-in for the UT1 domain list:
    DISTINCT hosts whose stable md5 coin is 0 mod BLOCK_MOD. In
    production this DataFrame is simply `spark.read` of the published
    list — everything downstream is identical."""
    return (
        hosts.select("host")
        .distinct()
        .where(
            F.expr(f"{H.md5_i64(chr(39) + 'blk:' + chr(39) + ' || host', S)}"
                   f" % {BLOCK_MOD} = 0")
        )
    )


def blocklist_filter(
    pages: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Pages surviving the domain blocklist: broadcast LEFT ANTI join
    on the extracted host — the corpus side never shuffles."""
    hosted = with_host(pages, url_col)
    return hosted.join(
        F.broadcast(blocklist.select("host")), "host", "left_anti"
    )


def blocklist_oracle_sql(d: str, pages_select: str) -> str:
    coin = H.md5_i64("'blk:' || host", d)
    return f"""
WITH pages AS ({pages_select}),
hosted AS (
  SELECT doc_id, {host_sql("url", d)} AS host FROM pages
),
blk AS (
  SELECT DISTINCT host FROM hosted WHERE {coin} % {BLOCK_MOD} = 0
)
SELECT h.doc_id, h.host
FROM hosted h
WHERE h.host NOT IN (SELECT host FROM blk)
""".strip()


def host_py(url: str) -> str:
    """Pure-Python mirror of host_sql for the differential tests."""
    import re

    e = (url or "").lower()
    e = re.sub(r"^https?://", "", e)
    e = re.sub(r"^www\.", "", e)
    return re.sub(r"[/?#].*$", "", e)


# ---------------------------------------------------------------------------
# Blocklist PROPOSAL from quality feedback (the list's maintenance loop)
# ---------------------------------------------------------------------------

PROPOSE_MIN_DOCS = 10
# integer-exact "keep rate < 0.3": 10*n_keep < 3*n_docs — no float
# boundary can disagree between engine and oracle
PROPOSE_RATE_NUM, PROPOSE_RATE_DEN = 3, 10


def spam_feed_sql(d: str, pages: str = "pages") -> str:
    """pages ∪ a digit-spam cohort concentrated on two new hosts —
    deterministic low-keep-rate positives for the proposal rule."""
    return (
        f"SELECT doc_id, url, text FROM {pages} "
        f"UNION ALL "
        f"SELECT doc_id + 9000000 AS doc_id, "
        f"'https://spam' || CAST(CASE WHEN doc_id % 12 = 0 THEN 0 ELSE 1 END"
        f" AS STRING) || '.example.com/p/' "
        f"|| CAST(doc_id AS STRING) AS url, "
        f"'00 11 22 33 44 55 66 77 88 99 ' || CAST(doc_id AS STRING) AS text "
        f"FROM {pages} WHERE doc_id % 6 = 0"
    )


def propose_blocklist(feed: DataFrame) -> DataFrame:
    """(host, n_docs, n_keep, keep_rate): hosts whose corpus volume is
    large enough to judge and whose quality keep rate is below the
    threshold — the feedback loop that MAINTAINS the blocklist
    dimension. One codegen battery pass + one host groupBy; the rule
    is pure integer arithmetic."""
    from . import quality

    k = quality.with_keep(quality.with_signals(with_host(feed)))
    g = k.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
    )
    return g.where(
        (F.col("n_docs") >= PROPOSE_MIN_DOCS)
        & (
            F.lit(PROPOSE_RATE_DEN) * F.col("n_keep")
            < F.lit(PROPOSE_RATE_NUM) * F.col("n_docs")
        )
    ).select(
        "host",
        "n_docs",
        "n_keep",
        F.round(
            F.col("n_keep").cast("double") / F.col("n_docs"), 6
        ).alias("keep_rate"),
    )


def propose_blocklist_oracle_sql(d: str, pages_select: str) -> str:
    from . import quality

    keep = quality.keep_sql(
        d, table="hosted", text_col="text", key_cols="doc_id, host"
    )
    return f"""
WITH pages AS ({pages_select}),
feed AS ({spam_feed_sql(d)}),
hosted AS (
  SELECT doc_id, text, {host_sql("url", d)} AS host FROM feed
),
k AS ({keep})
SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS keep_rate
FROM k GROUP BY host
HAVING count(*) >= {PROPOSE_MIN_DOCS}
   AND {PROPOSE_RATE_DEN} * sum(CASE WHEN keep THEN 1 ELSE 0 END)
       < {PROPOSE_RATE_NUM} * count(*)
""".strip()


# ---------------------------------------------------------------------------
# Empirical-Bayes host reputation (shrinkage-smoothed keep rate)
# ---------------------------------------------------------------------------

# Beta(m*g, m*(1-g)) prior with g = global keep rate: posterior mean
# (n_keep + m*g) / (n_docs + m). The standard fix for the proposal
# rule's blind spot — a 3-doc host with 0 keeps should NOT outrank a
# 300-doc host with 20% keeps. m is the prior strength in pseudo-docs.
REP_PRIOR_STRENGTH = 20.0


def host_reputation(feed: DataFrame) -> DataFrame:
    """(host, n_docs, n_keep, raw_rate, reputation): per-host keep
    rate shrunk toward the global rate by a Beta prior of strength
    REP_PRIOR_STRENGTH pseudo-docs.

    Scale shape: one codegen battery pass + one host groupBy (two-phase
    partial agg), then a 1-row global agg broadcast back via cross
    join — host-cardinality relation throughout, no corpus re-shuffle.
    All arithmetic is rational (+, *, /) in a fixed evaluation order,
    so the DuckDB oracle is IEEE-identical before the final round."""
    from . import quality

    k = quality.with_keep(quality.with_signals(with_host(feed)))
    g = k.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
    # consumed twice (totals + final select): checkpoint the
    # host-sized relation so the corpus battery pass runs once
    ).localCheckpoint(eager=False)
    tot = g.agg(
        F.sum("n_docs").alias("t_docs"), F.sum("n_keep").alias("t_keep")
    )
    m = F.lit(REP_PRIOR_STRENGTH)
    gl = F.col("t_keep").cast("double") / F.col("t_docs").cast("double")
    return g.crossJoin(F.broadcast(tot)).select(
        "host",
        "n_docs",
        "n_keep",
        F.round(F.col("n_keep").cast("double") / F.col("n_docs").cast("double"), 6).alias("raw_rate"),
        F.round(
            (F.col("n_keep").cast("double") + m * gl)
            / (F.col("n_docs").cast("double") + m),
            6,
        ).alias("reputation"),
    )


def host_reputation_oracle_sql(d: str, pages_select: str) -> str:
    from . import quality

    keep = quality.keep_sql(
        d, table="hosted", text_col="text", key_cols="doc_id, host"
    )
    m = REP_PRIOR_STRENGTH
    return f"""
WITH pages AS ({pages_select}),
feed AS ({spam_feed_sql(d)}),
hosted AS (
  SELECT doc_id, text, {host_sql("url", d)} AS host FROM feed
),
k AS ({keep}),
g AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
  FROM k GROUP BY host
),
tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS t_docs,
         CAST(sum(n_keep) AS BIGINT) AS t_keep
  FROM g
)
SELECT host, n_docs, n_keep,
       round(CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS raw_rate,
       round((CAST(n_keep AS DOUBLE) + {m} * (CAST(t_keep AS DOUBLE) / CAST(t_docs AS DOUBLE)))
             / (CAST(n_docs AS DOUBLE) + {m}), 6) AS reputation
FROM g CROSS JOIN tot
""".strip()


# ---------------------------------------------------------------------------
# Robots-style path rules + per-host crawl budget (frontier compliance)
# ---------------------------------------------------------------------------


def robots_rules_sql(d: str) -> str:
    """Deterministic stand-in rule table: (host, path_prefix) disallow
    pairs — h1 blocks /p/1 (prefix hits /p/1, /p/10..19, /p/100...),
    h2 blocks everything (/), h3 blocks a path that never matches."""
    return (
        "SELECT * FROM (VALUES "
        "('h1.example.com', '/p/1'), "
        "('h2.example.com', '/'), "
        "('h3.example.com', '/never/')"
        ") AS r(r_host, r_prefix)"
    )


def robots_filter(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """Drop pages matching any (host, path-prefix) disallow rule — the
    robots/compliance primitive every crawler-side pipeline runs.

    Plan: broadcast the (tiny, per-host) rule table, LEFT ANTI on
    host-equality + starts_with — the corpus never shuffles; rule
    evaluation is row-local against the broadcast side. Path is
    extracted once, codegen-side."""
    p = with_host(pages).withColumn(
        "__path", F.regexp_extract("url", r"https?://[^/]+(/[^?#]*)", 1)
    )
    cond = (F.col("host") == F.col("r_host")) & F.col("__path").startswith(
        F.col("r_prefix")
    )
    return p.join(F.broadcast(rules), cond, "left_anti").drop("__path")


def robots_filter_oracle_sql(d: str, pages_select: str) -> str:
    return f"""
WITH pages AS ({pages_select}),
rules AS ({robots_rules_sql(d)}),
hosted AS (
  SELECT doc_id, url, {host_sql("url", d)} AS host,
         regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1) AS path
  FROM pages
)
SELECT doc_id, host
FROM hosted h
WHERE NOT EXISTS (
  SELECT 1 FROM rules r
  WHERE h.host = r.r_host AND starts_with(h.path, r.r_prefix)
)
""".strip()


CRAWL_BUDGET = 20  # max pages admitted per host per hour


def crawl_budget_enforce(pages: DataFrame, budget: int = CRAWL_BUDGET) -> DataFrame:
    """(doc_id, host, hour, rk, admitted): politeness/budget quota —
    at most `budget` pages per host per hour window, earliest captures
    win (warc_ts then doc_id order). rank<=k per (host, hour) runs as
    WindowGroupLimit partial top-k, so only ~budget rows per group per
    map task cross the shuffle — the frontier stays host-fair even
    when one host floods a dump."""
    from pyspark.sql import Window

    p = with_host(pages).withColumn(
        "hour", F.date_trunc("hour", F.col("warc_ts"))
    )
    w = Window.partitionBy("host", "hour").orderBy(
        F.col("warc_ts").asc(), F.col("doc_id").asc()
    )
    return p.withColumn("rk", F.row_number().over(w)).select(
        "doc_id",
        "host",
        "hour",
        F.col("rk").cast("bigint").alias("rk"),
        (F.col("rk") <= budget).alias("admitted"),
    )


def crawl_budget_oracle_sql(
    d: str, pages_select: str, budget: int = CRAWL_BUDGET
) -> str:
    return f"""
WITH pages AS ({pages_select}),
hosted AS (
  SELECT doc_id, warc_ts, {host_sql("url", d)} AS host,
         date_trunc('hour', warc_ts) AS hour
  FROM pages
)
SELECT doc_id, host, hour,
       CAST(row_number() OVER (
         PARTITION BY host, hour ORDER BY warc_ts ASC, doc_id ASC
       ) AS BIGINT) AS rk,
       row_number() OVER (
         PARTITION BY host, hour ORDER BY warc_ts ASC, doc_id ASC
       ) <= {budget} AS admitted
FROM hosted
""".strip()
