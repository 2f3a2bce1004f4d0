"""Committed partitioned writes + checkpoint/resume (north rule).

The reference's fault-tolerance story is per-shard idempotent writes
plus `volume.commit()` (chunker.py:155-161, SURVEY.md §1.3): same
input file → same output file, rerun only what failed. The Spark
engine generalizes that to *partition-granular snapshot commits*:

* output is a parquet table partitioned by a date-ish key (`ds` from
  `warc_ts`) — the Iceberg mapping is `writeTo(...).overwritePartitions()`
  per ds; offline (no Iceberg jars) each partition directory is
  overwritten atomically-enough via `replaceWhere`-style dynamic
  partition overwrite;
* a MANIFEST parquet table records one row per committed partition
  (partition value, row counts, bytes hint, wall seconds, input
  fingerprint) — these are the "per-partition lineage + metrics rows";
* `resume_run` recomputes only partitions missing from the manifest —
  the kill-and-resume contract (tests/test_resume.py kills mid-run
  and completes on the second invocation without redoing work).

Metrics ride on `df.observe(...)` so they cost no extra pass; the
salt column spreads a skewed host across `n_salts` write tasks
(host-level skew, north rule) while `partitionBy("ds")` keeps the
table layout query-prunable.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

N_SALTS = 16
MANIFEST_DIR = "_manifest"

# When set (e.g. spark.conf.set(ICEBERG_TABLE_CONF, "cat.db.docs")), the
# partition write goes through Iceberg's `writeTo(...).overwritePartitions()`
# — a real snapshot commit — instead of the parquet-directory overwrite.
# The table must exist and be partitioned by ds. Offline (no Iceberg
# catalog/jars) the branch degrades gracefully to the parquet path; the
# manifest row records which sink actually committed.
ICEBERG_TABLE_CONF = "spark.fineweb.iceberg.table"


def with_partition_cols(
    df: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "url",
    n_salts: int = N_SALTS,
    granularity: str = "day",
) -> DataFrame:
    """ds (crawl ts truncated to `granularity`, as string) + salt.

    Production partitions by day; tests pass granularity="minute" so
    the minutes-wide fixture corpus still yields many partitions. The
    salt is NOT a layout column — it only shapes the shuffle so one
    hot host cannot pin a whole write task (pages.py constructs ~1/3
    of urls on host h0 to exercise exactly this)."""
    fmt = "yyyy-MM-dd" if granularity == "day" else "yyyy-MM-dd-HH-mm"
    return df.withColumn(
        "ds", F.date_format(F.date_trunc(granularity, F.col(ts_col)), fmt)
    ).withColumn("salt", F.pmod(F.xxhash64(key_col), F.lit(n_salts)))


def list_partitions(df: DataFrame) -> list[str]:
    return [str(r.ds) for r in df.select("ds").distinct().collect()]


def committed_partitions(spark: SparkSession, out_dir: str) -> set[str]:
    mpath = os.path.join(out_dir, MANIFEST_DIR)
    try:
        return {str(r.ds) for r in spark.read.parquet(mpath).select("ds").collect()}
    except Exception:  # noqa: BLE001 — manifest absent on first run
        return set()


def _write_manifest_row(spark: SparkSession, out_dir: str, row: dict) -> None:
    mpath = os.path.join(out_dir, MANIFEST_DIR)
    spark.createDataFrame([row]).coalesce(1).write.mode("append").parquet(mpath)


def write_partition(
    spark: SparkSession,
    df_partition: DataFrame,
    out_dir: str,
    ds: str,
    extra_lineage: dict | None = None,
) -> dict:
    """Overwrite ONE ds partition + append its manifest/metrics row.

    Idempotent: rerunning a ds replaces its directory and appends a
    fresh manifest row (readers take the latest row per ds). Iceberg
    form: `df.writeTo(tbl).overwritePartitions()` + snapshot commit.
    """
    obs = Observation(f"metrics_{ds}")
    observed = df_partition.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum(F.length("scrubbed_text").cast("long")).alias("out_chars"),
    )
    t0 = time.monotonic()
    sink = "parquet"
    tbl = spark.conf.get(ICEBERG_TABLE_CONF, None)
    if tbl:
        from pyspark.errors import AnalysisException

        try:
            # Analysis failures (catalog/jars/table absent) surface before
            # any job runs, so the Observation is untouched and the parquet
            # fallback below is safe. A mid-write RUNTIME failure must
            # propagate — masking it with a parquet retry would hide a
            # half-committed snapshot.
            observed.repartition(F.col("salt")).writeTo(
                tbl
            ).overwritePartitions()
            sink = "iceberg"
        except AnalysisException:
            sink = "parquet"
    if sink == "parquet":
        (
            observed.repartition(F.col("salt"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"ds={ds}"))
        )
    m = obs.get
    row = {
        "ds": ds,
        "sink": sink,
        "n_rows": int(m["n_rows"] or 0),
        "n_keep": int(m["n_keep"] or 0),
        "out_chars": int(m["out_chars"] or 0),
        "wall_s": round(time.monotonic() - t0, 3),
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit_seq": time.time_ns(),
        **(extra_lineage or {}),
    }
    if sink == "iceberg":
        # recorded so read_output can locate iceberg-committed partitions
        # (they have no parquet directory under out_dir); omitted on the
        # parquet path — mergeSchema widens reads across row shapes
        row["iceberg_table"] = tbl
    _write_manifest_row(spark, out_dir, row)
    return row


def resume_run(
    spark: SparkSession,
    build_df: Callable[[SparkSession], DataFrame],
    out_dir: str,
    fail_after: int | None = None,
) -> list[dict]:
    """Process every ds partition not yet in the manifest.

    build_df returns the full pipeline DataFrame (must already carry
    ds/salt/keep/scrubbed_text). Partition loop is driver-side by
    design — checkpoint granularity IS the partition; each iteration
    is one distributed job + one manifest commit, exactly the
    reference's rerun-failed-shards model (SURVEY.md §1.3).

    fail_after: test hook — raise after N commits (kill simulation).
    """
    df = build_df(spark)
    done = committed_partitions(spark, out_dir)
    pending = sorted(set(list_partitions(df)) - done)
    rows = []
    for i, ds in enumerate(pending):
        if fail_after is not None and i >= fail_after:
            raise RuntimeError(f"injected failure before partition {ds}")
        part = df.where(F.col("ds") == F.lit(ds))
        rows.append(write_partition(spark, part, out_dir, ds))
    return rows


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """All committed partitions, across sinks.

    Partitions committed through the Iceberg branch leave no parquet
    directory under out_dir — reading only the parquet layout would
    silently drop them. The manifest's sink/iceberg_table columns say
    where each ds actually lives: parquet partitions come off the
    directory scan, iceberg partitions are read from their table and
    unioned by name. An iceberg manifest row whose table can no longer
    be resolved raises instead of returning partial data."""
    def _parquet_scan() -> DataFrame:
        return spark.read.option("basePath", out_dir).parquet(
            os.path.join(out_dir, "ds=*")
        )

    try:
        man = read_manifest(spark, out_dir)
    except Exception:  # noqa: BLE001 — no manifest yet: plain directory scan
        return _parquet_scan()
    if "sink" not in man.columns:
        return _parquet_scan()
    ice_rows = man.where(F.col("sink") == "iceberg").select(
        "ds", *(["iceberg_table"] if "iceberg_table" in man.columns else [])
    ).collect()
    if not ice_rows:
        return _parquet_scan()
    have_parquet_ds = any(
        str(r.ds) not in {str(i.ds) for i in ice_rows}
        for r in man.select("ds").collect()
    )
    out = _parquet_scan() if have_parquet_ds else None
    by_table: dict[str, list[str]] = {}
    for r in ice_rows:
        tbl = getattr(r, "iceberg_table", None)
        if not tbl:
            raise RuntimeError(
                f"manifest records ds={r.ds} committed to iceberg but no "
                "iceberg_table column — cannot locate the data; refusing "
                "to return partial output"
            )
        by_table.setdefault(str(tbl), []).append(str(r.ds))
    for tbl, ds_list in by_table.items():
        try:
            ice = spark.table(tbl).where(F.col("ds").isin(ds_list))
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                f"manifest records partitions {ds_list} committed to "
                f"iceberg table {tbl!r}, which is not resolvable in this "
                "session — refusing to return partial output"
            ) from e
        out = ice if out is None else out.unionByName(
            ice, allowMissingColumns=True
        )
    return out


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest manifest row per ds (rewrites supersede older rows).
    mergeSchema: maintenance rows (op/compaction fields) widen the
    manifest schema over time — reads must union all row shapes."""
    m = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out_dir, MANIFEST_DIR)
    )
    if "commit_seq" not in m.columns:  # pre-upgrade manifests
        m = m.withColumn("commit_seq", F.lit(None).cast("long"))
    # committed_at has 1-second resolution — commit_seq (time_ns) breaks
    # same-second ties (e.g. a compaction right after its write); rows
    # from pre-upgrade manifests have NULL seq and lose ties, which is
    # the correct supersedence order
    w = F.row_number().over(
        Window.partitionBy("ds").orderBy(
            F.desc("committed_at"), F.desc_nulls_last("commit_seq")
        )
    )
    return m.withColumn("__rn", w).where("__rn = 1").drop("__rn")


def read_output_asof(spark: SparkSession, out_dir: str, as_of: str) -> DataFrame:
    """Snapshot read: only partitions whose manifest commit is ≤ as_of
    (ISO-8601 UTC string) — the parquet-manifest analog of Iceberg
    time travel (`VERSION AS OF` / `TIMESTAMP AS OF`)."""
    man = read_manifest(spark, out_dir).where(F.col("committed_at") <= as_of)
    ds_list = [r.ds for r in man.select("ds").collect()]
    if not ds_list:
        return read_output(spark, out_dir).limit(0)
    return read_output(spark, out_dir).where(F.col("ds").isin(ds_list))


# ---------------------------------------------------------------------------
# Table maintenance — the operations a 100-TB partitioned table needs
# between writes (the parquet-manifest analogs of Iceberg's
# rewrite_data_files / expire_snapshots).
# ---------------------------------------------------------------------------


def partition_files(out_dir: str, ds: str) -> list[str]:
    pdir = os.path.join(out_dir, f"ds={ds}")
    try:
        return [
            f
            for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith("_")
        ]
    except OSError:
        return []


def compact_partition(
    spark: SparkSession, out_dir: str, ds: str, target_files: int = 1
) -> dict:
    """Rewrite one ds partition into `target_files` files (small-file
    compaction: every salted write leaves up to N_SALTS files per
    partition; streams of incremental runs accumulate them until scan
    planning is dominated by file-open overhead). Reads the partition,
    coalesces, overwrites the SAME directory via a temp dir + atomic
    rename, and appends a superseding manifest row (op='compact') so
    time-travel reads stay consistent. Returns the manifest row."""
    import shutil
    import uuid

    pdir = os.path.join(out_dir, f"ds={ds}")
    n_before = len(partition_files(out_dir, ds))
    t0 = time.monotonic()
    df = spark.read.parquet(pdir)
    # compacted copy is written NEXT TO the partition (same filesystem,
    # so the swap below is two cheap renames, never a cross-fs copy)
    tag = uuid.uuid4().hex[:8]
    tmp = os.path.join(out_dir, f"_compact_{tag}")
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    n_rows = spark.read.parquet(tmp).count()
    # move-aside-then-delete: a crash mid-swap leaves either the old
    # dir in place or recoverable at the aside path — never zero copies
    aside = os.path.join(out_dir, f"_compact_old_{tag}")
    os.rename(pdir, aside)
    os.rename(tmp, pdir)
    shutil.rmtree(aside)
    row = {
        "ds": ds,
        "sink": "parquet",
        "op": "compact",
        "n_rows": int(n_rows),
        "n_files_before": n_before,
        "n_files_after": len(partition_files(out_dir, ds)),
        "wall_s": round(time.monotonic() - t0, 3),
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit_seq": time.time_ns(),
    }
    _write_manifest_row(spark, out_dir, row)
    return row


def vacuum_manifest(spark: SparkSession, out_dir: str) -> int:
    """Drop superseded manifest rows (every row except the latest per
    ds) — the expire-snapshots analog. Time-travel reads older than the
    vacuum horizon stop resolving, exactly like Iceberg retention.
    Returns the number of rows removed."""
    mpath = os.path.join(out_dir, MANIFEST_DIR)
    full = spark.read.parquet(mpath)
    latest = read_manifest(spark, out_dir)
    n_removed = full.count() - latest.count()
    tmp = mpath + "__vacuum"
    latest.coalesce(1).write.mode("overwrite").parquet(tmp)
    import shutil

    # move-aside-then-delete (same discipline as compact_partition): a
    # crash mid-swap leaves the manifest either in place or recoverable
    # at the aside path — never destroyed
    aside = mpath + "__vacuum_old"
    os.rename(mpath, aside)
    shutil.move(tmp, mpath)
    shutil.rmtree(aside)
    return int(n_removed)
