"""Snapshot diff between two crawls: added / removed / changed /
unchanged per normalized URL.

The primitive behind incremental curation: a new CommonCrawl dump
lands and the pipeline should re-score only what actually changed,
retire what disappeared, and admit what is new — instead of
re-running the full DAG over 100 TB. (The reference re-embeds whole
dumps; diffing is how the toolbox avoids that at scale.)

Spec: key = normalized URL (urldedup.normalize_sql), content identity
= md5(text). One row per key per snapshot is a PRECONDITION (run
url_dedup/url_dedup_latest first; the planted corpus guarantees it).

Scale shape: each snapshot collapses to (norm_url, md5) — codegen,
column-pruned — then ONE full-outer shuffle join on norm_url. The
status CASE is row-local. No driver-side anything; at 10^12 keys the
join is the floor for any exact diff, and both sides shuffle the
16-byte digest, never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from . import urldedup

S, D = sd.SPARK, sd.DUCKDB


def new_snapshot_sql(d: str, pages: str = "pages") -> str:
    """The re-crawl: every 11th URL vanished, every 7th (surviving)
    page was revised, and a cohort of brand-new URLs appeared."""
    return (
        f"SELECT doc_id, url, "
        f"CASE WHEN doc_id % 7 = 0 THEN text || ' revised' ELSE text END AS text "
        f"FROM {pages} WHERE doc_id % 11 <> 0 "
        f"UNION ALL "
        f"SELECT doc_id + 7000000 AS doc_id, "
        f"'https://h' || CAST(doc_id % 13 AS STRING) || '.example.com/new/' "
        f"|| CAST(doc_id AS STRING) AS url, "
        f"'fresh page body ' || CAST(doc_id AS STRING) AS text "
        f"FROM {pages} WHERE doc_id % 17 = 0"
    )


def _keyed(df: DataFrame, tag: str) -> DataFrame:
    return urldedup.with_norm_url(df).select(
        "norm_url", F.md5(F.coalesce("text", F.lit(""))).alias(f"{tag}_md5")
    )


def crawl_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(norm_url, status) over the union of both snapshots' keys."""
    o, n = _keyed(old, "old"), _keyed(new, "new")
    joined = o.join(n, "norm_url", "full_outer")
    return joined.select(
        "norm_url",
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def crawl_diff_oracle_sql(d: str, pages_select: str) -> str:
    norm = urldedup.normalize_sql("url", d)
    return f"""
WITH pages AS ({pages_select}),
new_snap AS ({new_snapshot_sql(d)}),
o AS (SELECT {norm} AS norm_url, md5(coalesce(text, '')) AS old_md5 FROM pages),
n AS (SELECT {norm} AS norm_url, md5(coalesce(text, '')) AS new_md5 FROM new_snap)
SELECT coalesce(o.norm_url, n.norm_url) AS norm_url,
       CASE WHEN o.norm_url IS NULL THEN 'added'
            WHEN n.norm_url IS NULL THEN 'removed'
            WHEN old_md5 <> new_md5 THEN 'changed'
            ELSE 'unchanged' END AS status
FROM o FULL OUTER JOIN n ON o.norm_url = n.norm_url
""".strip()


def incremental_rescore(old: DataFrame, new: DataFrame) -> DataFrame:
    """Quality keep/drop for ONLY the added/changed rows of the new
    snapshot — the downstream payoff of the diff: at 10^12 docs the
    expensive battery touches the (small) delta, not the corpus.

    The diff's (norm_url, status) relation is delta-sized after the
    status filter, and joins the new snapshot on its already-computed
    norm_url — text flows once, only for delta rows."""
    from . import quality

    delta_keys = crawl_diff(old, new).where(
        F.col("status").isin("added", "changed")
    )
    delta = urldedup.with_norm_url(new).join(delta_keys, "norm_url")
    scored = quality.with_keep(quality.with_signals(delta))
    return scored.select("doc_id", "norm_url", "status", "keep")


def incremental_rescore_oracle_sql(d: str, pages_select: str) -> str:
    from . import quality

    diff = crawl_diff_oracle_sql(d, pages_select)
    norm = urldedup.normalize_sql("url", d)
    keep = quality.keep_sql(
        d, table="delta", text_col="text", key_cols="doc_id, norm_url, status"
    )
    return f"""
WITH diff AS ({diff}),
new_snap2 AS (
  WITH pages AS ({pages_select})
  {new_snapshot_sql(d)}
),
delta AS (
  SELECT s.doc_id, s.text, d.norm_url, d.status
  FROM (SELECT doc_id, text, {norm} AS norm_url FROM new_snap2) s
  JOIN diff d ON s.norm_url = d.norm_url
  WHERE d.status IN ('added', 'changed')
)
SELECT doc_id, norm_url, status, keep FROM ({keep})
""".strip()


def _score_keys(snap: DataFrame, keys: DataFrame) -> DataFrame:
    """Quality keep over the snapshot rows whose norm_url is in keys."""
    from . import quality

    rows = urldedup.with_norm_url(snap).join(keys.select("norm_url"), "norm_url")
    return quality.with_keep(quality.with_signals(rows)).select(
        "norm_url", "doc_id", "keep"
    )


def merge_rescored(old: DataFrame, new: DataFrame) -> DataFrame:
    """The incremental-curation contract, closed: previously-computed
    scores for UNCHANGED keys + freshly-computed scores for the
    added/changed delta, removed keys retired — and the result must
    equal a full recompute over the new snapshot (which is exactly
    what the gate's oracle asserts).

    old's battery pass stands in for the stored score table a real
    deployment reads back; only the delta pays the battery. Unchanged
    rows REUSE the stored score but carry the NEW snapshot's row
    identity (content-identical text, so the score transfers; the
    capture id must not — the first toy test caught exactly that).
    The diff relation is consumed twice (delta keys, unchanged keys),
    so it is localCheckpoint'ed — the committed-diff-table analog."""
    diff = crawl_diff(old, new).localCheckpoint(eager=False)
    delta_keys = diff.where(F.col("status").isin("added", "changed"))
    unchanged_keys = diff.where(F.col("status") == "unchanged")
    stored_scores = _score_keys(old, unchanged_keys).select(
        "norm_url", "keep"
    )
    unchanged_part = (
        urldedup.with_norm_url(new)
        .join(unchanged_keys.select("norm_url"), "norm_url")
        .select("norm_url", "doc_id")
        .join(stored_scores, "norm_url")
    )
    return _score_keys(new, delta_keys).unionByName(unchanged_part)


def merge_rescored_oracle_sql(d: str, pages_select: str) -> str:
    """Full recompute over the new snapshot — incremental == batch."""
    from . import quality

    norm = urldedup.normalize_sql("url", d)
    keep = quality.keep_sql(
        d, table="keyed", text_col="text", key_cols="norm_url, doc_id"
    )
    return f"""
WITH pages AS ({pages_select}),
new_snap AS ({new_snapshot_sql(d)}),
keyed AS (SELECT doc_id, text, {norm} AS norm_url FROM new_snap)
SELECT norm_url, doc_id, keep FROM ({keep})
""".strip()


# ---------------------------------------------------------------------------
# Token-distribution drift between two snapshots (corpus monitoring)
# ---------------------------------------------------------------------------

from ..spec import hashing as H  # noqa: E402

DRIFT_TOP_N = 200


def _token_counts(df: DataFrame, tag: str) -> DataFrame:
    t = df.select(
        F.explode(F.expr(H.tokens_lower("text", S))).alias("token")
    ).where(F.col("token") != "")
    return t.groupBy("token").agg(F.count("*").alias(f"{tag}_cnt"))


def token_drift(old: DataFrame, new: DataFrame, top_n: int = DRIFT_TOP_N) -> DataFrame:
    """Top-N drifting tokens between two snapshots' unigram
    distributions: chi-squared contribution + total-variation term
    per token under add-one (Laplace) smoothing over the union vocab.

    The monitoring primitive for a rolling crawl: a spam wave, a
    boilerplate change, or an extraction regression shows up as mass
    moving between tokens long before aggregate quality rates move.

    Deliberately NOT KL-divergence: log/exp are transcendental and
    last-ulp-divergent across engines; chi2 and TV are rational in a
    fixed evaluation order, so both engines produce bit-identical
    doubles, reported as exact integer-scaled units (same discipline
    as the quality classifier's rational logit).

    Scale shape: per-snapshot unigram histogram = explode + two-phase
    partial count (the only corpus-sized stage, map-side combined);
    everything after is vocab-sized — one full-outer join, a 1-row
    totals agg broadcast back, and a integer-scaled-key top-N via global
    TakeOrderedAndProject. No corpus re-shuffle, no driver loops."""
    j = (
        _token_counts(old, "old")
        .join(_token_counts(new, "new"), "token", "full_outer")
        .select(
            "token",
            F.coalesce("old_cnt", F.lit(0)).alias("old_cnt"),
            F.coalesce("new_cnt", F.lit(0)).alias("new_cnt"),
        )
        # consumed twice (totals agg + scoring): checkpoint, or the
        # corpus-sized histogram subtree executes twice (PLANS.md
        # showed the full scan+explode+join duplicated under the
        # totals BroadcastExchange)
        .localCheckpoint(eager=False)
    )
    tot = j.agg(
        F.sum("old_cnt").alias("old_tot"),
        F.sum("new_cnt").alias("new_tot"),
        F.count("*").alias("vocab"),
    )
    p_old = (F.col("old_cnt").cast("double") + F.lit(1.0)) / (
        F.col("old_tot").cast("double") + F.col("vocab").cast("double")
    )
    p_new = (F.col("new_cnt").cast("double") + F.lit(1.0)) / (
        F.col("new_tot").cast("double") + F.col("vocab").cast("double")
    )
    # integer-scaled terms (units of 1e-12): floor over bit-identical
    # doubles is engine-exact, unlike decimal round whose half-up step
    # differs between BigDecimal (Spark) and double math (DuckDB)
    s = j.crossJoin(F.broadcast(tot)).select(
        "token",
        "old_cnt",
        "new_cnt",
        F.floor((p_new - p_old) * (p_new - p_old) / p_old * F.lit(1e12)).alias("chi2_e12"),
        F.floor(F.abs(p_new - p_old) / F.lit(2.0) * F.lit(1e12)).alias("tv_e12"),
    )
    return s.orderBy(F.col("chi2_e12").desc(), F.col("token").asc()).limit(top_n)


def token_drift_oracle_sql(
    d: str, pages_select: str, top_n: int = DRIFT_TOP_N
) -> str:
    toks = H.tokens_lower("text", d)
    return f"""
WITH pages AS ({pages_select}),
new_snap AS ({new_snapshot_sql(d)}),
o AS (
  SELECT token, CAST(count(*) AS BIGINT) AS old_cnt
  FROM (SELECT unnest({toks}) AS token FROM pages) t
  WHERE token <> '' GROUP BY token
),
n AS (
  SELECT token, CAST(count(*) AS BIGINT) AS new_cnt
  FROM (SELECT unnest({toks}) AS token FROM new_snap) t
  WHERE token <> '' GROUP BY token
),
j AS (
  SELECT coalesce(o.token, n.token) AS token,
         coalesce(old_cnt, 0) AS old_cnt,
         coalesce(new_cnt, 0) AS new_cnt
  FROM o FULL OUTER JOIN n ON o.token = n.token
),
tot AS (
  SELECT CAST(sum(old_cnt) AS BIGINT) AS old_tot,
         CAST(sum(new_cnt) AS BIGINT) AS new_tot,
         CAST(count(*) AS BIGINT) AS vocab
  FROM j
),
s AS (
  SELECT token, old_cnt, new_cnt,
    (CAST(new_cnt AS DOUBLE) + 1.0) / (CAST(new_tot AS DOUBLE) + CAST(vocab AS DOUBLE)) AS p_new,
    (CAST(old_cnt AS DOUBLE) + 1.0) / (CAST(old_tot AS DOUBLE) + CAST(vocab AS DOUBLE)) AS p_old
  FROM j CROSS JOIN tot
)
SELECT token, old_cnt, new_cnt,
       CAST(floor((p_new - p_old) * (p_new - p_old) / p_old * 1e12) AS BIGINT) AS chi2_e12,
       CAST(floor(abs(p_new - p_old) / 2.0 * 1e12) AS BIGINT) AS tv_e12
FROM s
ORDER BY chi2_e12 DESC, token ASC
LIMIT {top_n}
""".strip()


def quality_transition(old: DataFrame, new: DataFrame) -> DataFrame:
    """(transition, n_urls): per-URL keep-bit transitions between two
    snapshots (kept->kept, kept->dropped, dropped->kept,
    dropped->dropped) — the report that separates 'the crawl got
    worse' from 'the filter changed'. Each snapshot pays one battery
    pass collapsed to (norm_url, keep); one key join; 4-row output."""
    from . import quality

    def keyed(df: DataFrame, tag: str) -> DataFrame:
        k = quality.with_keep(quality.with_signals(urldedup.with_norm_url(df)))
        return k.select("norm_url", F.col("keep").alias(f"{tag}_keep"))

    j = keyed(old, "old").join(keyed(new, "new"), "norm_url")
    return (
        j.select(
            F.concat(
                F.when(F.col("old_keep"), F.lit("kept")).otherwise(F.lit("dropped")),
                F.lit("->"),
                F.when(F.col("new_keep"), F.lit("kept")).otherwise(F.lit("dropped")),
            ).alias("transition")
        )
        .groupBy("transition")
        .agg(F.count("*").alias("n_urls"))
    )


def quality_transition_oracle_sql(d: str, pages_select: str) -> str:
    from . import quality

    norm = urldedup.normalize_sql("url", d)
    keep_old = quality.keep_sql(d, table="keyed_old", text_col="text",
                                key_cols="norm_url")
    keep_new = quality.keep_sql(d, table="keyed_new", text_col="text",
                                key_cols="norm_url")
    return f"""
WITH pages AS ({pages_select}),
new_snap AS ({new_snapshot_sql(d)}),
keyed_old AS (SELECT {norm} AS norm_url, text FROM pages),
keyed_new AS (SELECT {norm} AS norm_url, text FROM new_snap),
o AS (SELECT norm_url, keep AS old_keep FROM ({keep_old})),
n AS (SELECT norm_url, keep AS new_keep FROM ({keep_new}))
SELECT (CASE WHEN old_keep THEN 'kept' ELSE 'dropped' END)
       || '->' ||
       (CASE WHEN new_keep THEN 'kept' ELSE 'dropped' END) AS transition,
       CAST(count(*) AS BIGINT) AS n_urls
FROM o JOIN n USING (norm_url)
GROUP BY transition
""".strip()


# ---------------------------------------------------------------------------
# SCD2 URL history: a versioned dimension over N crawl snapshots
# ---------------------------------------------------------------------------
#
# The lakehouse-native way to keep "what did this URL say, when" —
# one row per (url, content-version) with a [valid_from, valid_to)
# snapshot-id interval and an is_current flag. Rebuilding training
# corpora as-of an earlier crawl, auditing when a page turned into
# spam, and retiring vanished URLs all read this one relation instead
# of N full snapshots. (The reference keeps only the newest dump;
# this is the history the diff operators above make cheap to keep.)
#
# Scale shape: each snapshot collapses to (norm_url, md5, snap_id) —
# codegen, column-pruned, text never shuffles — and every window is
# PARTITIONED BY norm_url, so state per key is the handful of
# versions of one URL, never the corpus. One shuffle on norm_url
# total (the union inherits it; Spark reuses the partitioning across
# the lag/sum/lead windows and the run groupBy).


def third_snapshot_sql(d: str, pages: str = "pages") -> str:
    """Crawl #3 on top of `new_snapshot_sql`'s crawl #2: every 19th
    of crawl-2's survivors vanished, every 5th survivor was revised
    AGAIN (a second content version), crawl-2's %7 revisions persist,
    and a fresh %23 cohort appeared. Pure function of doc_id."""
    return (
        f"SELECT doc_id, url, "
        f"CASE WHEN doc_id % 7 = 0 THEN text || ' revised' ELSE text END "
        f"|| CASE WHEN doc_id % 5 = 0 THEN ' rev2' ELSE '' END AS text "
        f"FROM {pages} WHERE doc_id % 11 <> 0 AND doc_id % 19 <> 0 "
        f"UNION ALL "
        f"SELECT doc_id + 7000000 AS doc_id, "
        f"'https://h' || CAST(doc_id % 13 AS STRING) || '.example.com/new/' "
        f"|| CAST(doc_id AS STRING) AS url, "
        f"'fresh page body ' || CAST(doc_id AS STRING) "
        f"|| CASE WHEN doc_id % 34 = 0 THEN ' updated' ELSE '' END AS text "
        f"FROM {pages} WHERE doc_id % 17 = 0 "
        f"UNION ALL "
        f"SELECT doc_id + 9000000 AS doc_id, "
        f"'https://h' || CAST(doc_id % 13 AS STRING) || '.example.com/new2/' "
        f"|| CAST(doc_id AS STRING) AS url, "
        f"'brand new page ' || CAST(doc_id AS STRING) AS text "
        f"FROM {pages} WHERE doc_id % 23 = 0"
    )


def scd2_history(snaps: list[DataFrame]) -> DataFrame:
    """(norm_url, version_n, md5, valid_from, valid_to, is_current):
    SCD2 dimension over ordered snapshots (snaps[i] = snapshot i).

    A version is a maximal run of CONSECUTIVE snapshots with the same
    md5; a gap (URL absent from a snapshot) closes the version even
    if the content later reappears unchanged. valid_to is therefore
    always last_seen + 1 — the first snapshot id where this version
    no longer holds (a successor version, a deletion, or a gap all
    start exactly there, so no lead() pass is needed and the column
    is never NULL; nullable ints degrade to float64 in the driver's
    pandas fetch and would hash-diverge). is_current marks versions
    alive at the newest snapshot (valid_to == len(snaps)).
    """
    from pyspark.sql import Window

    n = len(snaps)
    tagged = None
    for i, s in enumerate(snaps):
        t = urldedup.with_norm_url(s).select(
            "norm_url",
            F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("md5"),
            F.lit(i).cast("bigint").alias("snap_id"),
        )
        tagged = t if tagged is None else tagged.unionAll(t)
    w = Window.partitionBy("norm_url").orderBy("snap_id")
    flagged = tagged.select(
        "norm_url",
        "md5",
        "snap_id",
        F.when(
            F.lag("md5").over(w).isNull()
            | (F.lag("md5").over(w) != F.col("md5"))
            | (F.lag("snap_id").over(w) != F.col("snap_id") - 1),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_start"),
    )
    versioned = flagged.withColumn(
        "version_n", F.sum("is_start").over(w).cast("bigint")
    )
    runs = versioned.groupBy("norm_url", "version_n", "md5").agg(
        F.min("snap_id").alias("valid_from"),
        F.max("snap_id").alias("last_snap"),
    )
    out = runs.select(
        "norm_url",
        "version_n",
        "md5",
        F.col("valid_from").cast("bigint").alias("valid_from"),
        (F.col("last_snap") + 1).cast("bigint").alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to") == F.lit(n))


def scd2_oracle_sql(d: str, pages_select: str, n_snaps: int = 3) -> str:
    """The identical version algebra in portable window SQL: lag-flag
    version starts, running-sum version ids, per-run min/max, and
    valid_to = last_seen + 1."""
    norm = urldedup.normalize_sql("url", d)
    snap2 = new_snapshot_sql(d)
    snap3 = third_snapshot_sql(d)
    if d != sd.SPARK:
        snap2 = snap2.replace("AS STRING", "AS VARCHAR")
        snap3 = snap3.replace("AS STRING", "AS VARCHAR")
    return f"""
WITH pages AS ({pages_select}),
snap1 AS (SELECT doc_id, url, text FROM pages),
snap2 AS ({snap2}),
snap3 AS ({snap3}),
tagged AS (
  SELECT {norm} AS norm_url, md5(coalesce(text, '')) AS md5,
         CAST(0 AS BIGINT) AS snap_id FROM snap1
  UNION ALL
  SELECT {norm} AS norm_url, md5(coalesce(text, '')) AS md5,
         CAST(1 AS BIGINT) AS snap_id FROM snap2
  UNION ALL
  SELECT {norm} AS norm_url, md5(coalesce(text, '')) AS md5,
         CAST(2 AS BIGINT) AS snap_id FROM snap3
),
flagged AS (
  SELECT norm_url, md5, snap_id,
         CASE WHEN lag(md5) OVER w IS NULL
              OR lag(md5) OVER w <> md5
              OR lag(snap_id) OVER w <> snap_id - 1
              THEN 1 ELSE 0 END AS is_start
  FROM tagged
  WINDOW w AS (PARTITION BY norm_url ORDER BY snap_id)
),
versioned AS (
  SELECT norm_url, md5, snap_id,
         CAST(sum(is_start) OVER (PARTITION BY norm_url ORDER BY snap_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS version_n
  FROM flagged
),
runs AS (
  SELECT norm_url, version_n, md5,
         min(snap_id) AS valid_from, max(snap_id) AS last_snap
  FROM versioned GROUP BY norm_url, version_n, md5
)
SELECT norm_url, version_n, md5,
       CAST(valid_from AS BIGINT) AS valid_from,
       CAST(last_snap + 1 AS BIGINT) AS valid_to,
       (last_snap + 1 = {n_snaps}) AS is_current
FROM runs
""".strip()
