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
