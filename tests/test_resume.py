"""Kill-and-resume contract of the committed write layer (north rule).

Run the full pipeline partition-by-partition, inject a failure after
two commits, then resume: the second run must (a) complete, (b) NOT
rewrite the already-committed partitions, (c) produce exactly the
rows a straight-through run produces, and (d) leave one manifest
metrics row per partition.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fineweb_modal_spark import sinks
from fineweb_modal_spark.plans import pipeline as pl

SF = "/root/testdata/sf0.001"


def _build(spark):
    df = pl.run_pipeline(spark, SF)
    return sinks.with_partition_cols(df, granularity="minute").select(
        "url", "ds", "salt", "doc_id", "keep", "drop_reason", "scrubbed_text"
    )


def test_kill_and_resume(spark, tmp_path):
    out = str(tmp_path / "out")

    with pytest.raises(RuntimeError, match="injected failure"):
        sinks.resume_run(spark, _build, out, fail_after=2)

    committed_first = sinks.committed_partitions(spark, out)
    assert len(committed_first) == 2

    # record commit fingerprints (file mtimes) of the first two dirs
    def part_mtime(ds: str) -> float:
        d = os.path.join(out, f"ds={ds}")
        return max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d))

    mtimes = {ds: part_mtime(ds) for ds in committed_first}

    rows = sinks.resume_run(spark, _build, out)
    assert {r["ds"] for r in rows}.isdisjoint(committed_first)

    # previously committed partitions untouched by the resume
    for ds, mt in mtimes.items():
        assert part_mtime(ds) == mt

    # output complete and exactly equal to a straight-through plan
    got = sinks.read_output(spark, out)
    want = _build(spark)
    assert got.count() == want.count()
    assert (
        got.select("url", "keep", "scrubbed_text")
        .exceptAll(want.select("url", "keep", "scrubbed_text"))
        .count()
        == 0
    )

    # one manifest metrics row per partition, counts consistent
    man = sinks.read_manifest(spark, out).collect()
    assert len(man) == len(sinks.committed_partitions(spark, out))
    per_ds = {
        r.ds: r.n
        for r in got.groupBy("ds").agg(F.count("*").alias("n")).collect()
    }
    for r in man:
        assert r.n_rows == per_ds[r.ds]
        assert 0 <= r.n_keep <= r.n_rows


def test_rerun_is_noop(spark, tmp_path):
    out = str(tmp_path / "out2")
    first = sinks.resume_run(spark, _build, out)
    assert first
    second = sinks.resume_run(spark, _build, out)
    assert second == []


def test_salt_spreads_hot_host(spark):
    """~1/3 of urls share host h0; the salt must spread them across
    (nearly) all write buckets."""
    df = sinks.with_partition_cols(
        pl.run_pipeline(spark, SF), granularity="day"
    )
    hot = df.where(F.col("url").like("https://h0.%"))
    n_buckets = hot.select("salt").distinct().count()
    assert n_buckets >= sinks.N_SALTS - 2


def test_partition_pruning_on_output(spark, tmp_path):
    """Reading one ds partition of the committed output must prune at
    the source (PartitionFilters in the scan), not post-filter — the
    property that makes per-day queries O(day) not O(corpus)."""
    out = str(tmp_path / "out3")
    sinks.resume_run(spark, _build, out)
    some_ds = sorted(sinks.committed_partitions(spark, out))[0]
    q = sinks.read_output(spark, out).where(F.col("ds") == some_ds)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ds" in m.group(1)
    assert q.count() > 0


def test_time_travel_read(spark, tmp_path):
    """Snapshot-as-of read returns exactly the partitions committed at
    or before the chosen manifest timestamp."""
    out = str(tmp_path / "out4")
    sinks.resume_run(spark, _build, out)
    man = sorted(sinks.read_manifest(spark, out).collect(), key=lambda r: (r.committed_at, r.ds))
    cut = man[1].committed_at  # after the second commit (ties included)
    expected_ds = {r.ds for r in man if r.committed_at <= cut}
    got = sinks.read_output_asof(spark, out, cut)
    assert {r.ds for r in got.select("ds").distinct().collect()} == expected_ds
    # full read sees strictly more partitions than the snapshot
    assert len(expected_ds) < len(man)


def test_iceberg_branch_falls_back_gracefully_offline(spark, tmp_path):
    """With spark.fineweb.iceberg.table set but no Iceberg catalog
    configured (this container), write_partition must degrade to the
    parquet+manifest path, record sink='parquet', and produce
    identical output to an unconfigured run."""
    out = str(tmp_path / "out_ice")
    spark.conf.set(sinks.ICEBERG_TABLE_CONF, "nosuchcat.db.docs")
    try:
        sinks.resume_run(spark, _build, out)
    finally:
        spark.conf.unset(sinks.ICEBERG_TABLE_CONF)
    man = sinks.read_manifest(spark, out).collect()
    assert man and all(r.sink == "parquet" for r in man)
    got = sinks.read_output(spark, out)
    want = _build(spark)
    assert got.count() == want.count()


def test_compaction_preserves_data_and_supersedes_manifest(spark, tmp_path):
    """Compacting a salted partition reduces its file count to 1,
    leaves the row set byte-identical, and appends a superseding
    manifest row; vacuum then drops the superseded history."""
    import os
    import shutil
    import tempfile

    out = str(tmp_path / "out_compact")
    sinks.resume_run(spark, _build, out)
    ds = sorted(sinks.committed_partitions(spark, out))[0]
    # simulate small-file accumulation from incremental runs (AQE
    # coalesces the salted shuffle to one file at fixture scale):
    # split the partition into 4 files, byte-identical row set
    pdir = os.path.join(out, f"ds={ds}")
    tmp = tempfile.mkdtemp(prefix="split_") + "/part"
    spark.read.parquet(pdir).repartition(4).write.parquet(tmp)
    shutil.rmtree(pdir)
    shutil.move(tmp, pdir)
    before_rows = sorted(
        map(tuple, sinks.read_output(spark, out).where(F.col("ds") == ds).collect())
    )
    n_files_before = len(sinks.partition_files(out, ds))
    assert n_files_before > 1

    row = sinks.compact_partition(spark, out, ds, target_files=1)
    assert row["n_files_after"] == 1
    assert row["n_rows"] == len(before_rows)
    after_rows = sorted(
        map(tuple, sinks.read_output(spark, out).where(F.col("ds") == ds).collect())
    )
    assert after_rows == before_rows
    # manifest: compact row supersedes the original write row for ds
    man = {r.ds: r for r in sinks.read_manifest(spark, out).collect()}
    assert man[ds].op == "compact"
    # resume is still a no-op (partition remains committed)
    assert sinks.resume_run(spark, _build, out) == []

    removed = sinks.vacuum_manifest(spark, out)
    assert removed >= 1
    man2 = {r.ds: r for r in sinks.read_manifest(spark, out).collect()}
    assert set(man2) == set(man)


def test_manifest_schema_evolution_reads_merged(spark, tmp_path):
    """Maintenance rows widen the manifest schema (op, file counts);
    read_manifest must surface old and new row shapes together."""
    out = str(tmp_path / "out_evolve")
    sinks.resume_run(spark, _build, out)
    ds = sorted(sinks.committed_partitions(spark, out))[0]
    sinks.compact_partition(spark, out, ds)
    man = sinks.read_manifest(spark, out)
    cols = set(man.columns)
    assert {"ds", "n_rows", "committed_at", "op", "n_files_after"} <= cols
    # non-compacted partitions still carry their write metrics
    other = [r for r in man.collect() if r.ds != ds]
    assert other and all(r.n_keep is not None for r in other)


def test_read_output_refuses_partial_when_iceberg_unresolvable(spark, tmp_path):
    """A manifest recording an iceberg-committed partition whose table
    cannot be resolved must make read_output RAISE, not silently return
    only the parquet partitions (reader blindness to iceberg commits)."""
    import pytest

    out = str(tmp_path / "out_mixed")
    sinks.resume_run(spark, _build, out)
    n_parquet_ds = sinks.read_manifest(spark, out).count()
    # forge an iceberg-committed partition row (a ds with no parquet dir)
    sinks._write_manifest_row(
        spark,
        out,
        {
            "ds": "9999-01-01-00-00",
            "sink": "iceberg",
            "iceberg_table": "nosuchcat.db.docs",
            "n_rows": 1,
            "n_keep": 1,
            "out_chars": 1,
            "wall_s": 0.0,
            "committed_at": "2099-01-01T00:00:00Z",
            "commit_seq": 1,
        },
    )
    with pytest.raises(RuntimeError, match="refusing to return partial"):
        sinks.read_output(spark, out).count()
    # resume must also treat the iceberg ds as committed (not rerun it)
    assert "9999-01-01-00-00" in sinks.committed_partitions(spark, out)
    assert sinks.read_manifest(spark, out).count() == n_parquet_ds + 1


def test_vacuum_survives_and_is_crash_safe_layout(spark, tmp_path):
    """vacuum keeps exactly the latest row per ds and leaves no
    aside/temp directories behind (the crash-safe swap cleans up)."""
    import os

    out = str(tmp_path / "out_vac")
    sinks.resume_run(spark, _build, out)
    ds0 = sorted(sinks.committed_partitions(spark, out))[0]
    sinks.compact_partition(spark, out, ds0)  # superseding row
    removed = sinks.vacuum_manifest(spark, out)
    assert removed >= 1
    man = sinks.read_manifest(spark, out)
    assert man.groupBy("ds").count().where("count > 1").count() == 0
    leftovers = [
        f for f in os.listdir(out)
        if f.startswith("_manifest__vacuum")
    ]
    assert leftovers == []
