"""Arrow IPC source connector: lossless scan of .arrow shard dirs in
both IPC formats (stream — what HF writes — and file), with
pyarrow-layer column pruning."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

from fineweb_modal_spark.sources import arrow_ipc
from fineweb_modal_spark.sources.tables import table_path

SF = "/root/testdata/sf0.001"


def test_stream_shards_roundtrip(spark, tmp_path):
    out = str(tmp_path / "shards")
    paths = arrow_ipc.write_arrow_shards(
        table_path(SF, "documents"), out, n_shards=3
    )
    assert [os.path.basename(p) for p in paths] == [
        f"data-{i:05d}-of-00003.arrow" for i in range(3)
    ]
    got = arrow_ipc.read_arrow_ipc(spark, out)
    want = spark.read.parquet(table_path(SF, "documents"))
    assert got.schema == want.schema
    assert sorted(got.collect()) == sorted(want.collect())


def test_file_format_and_column_pruning(spark, tmp_path):
    table = pq.read_table(table_path(SF, "documents"))
    path = str(tmp_path / "data-00000-of-00001.arrow")
    with pa.ipc.new_file(path, table.schema) as w:  # file format, magic ARROW1
        w.write_table(table)
    got = arrow_ipc.read_arrow_ipc(
        spark, str(tmp_path), columns=["doc_id", "source"]
    )
    assert got.columns == ["doc_id", "source"]
    assert got.count() == table.num_rows
    s = got.agg(F.sum("doc_id")).first()[0]
    assert s == sum(table.column("doc_id").to_pylist())


def test_python_datasource_matches_parquet(spark, tmp_path):
    """The registered `arrow_ipc` format (Python Data Source API) must
    be lossless vs the parquet original and partition one task per
    shard file."""
    out = str(tmp_path / "shards_ds")
    arrow_ipc.write_arrow_shards(table_path(SF, "documents"), out, n_shards=3)
    arrow_ipc.register_arrow_ipc_datasource(spark)
    got = spark.read.format("arrow_ipc").load(out)
    want = spark.read.parquet(table_path(SF, "documents"))
    assert got.schema == want.schema
    assert got.rdd.getNumPartitions() == 3
    assert sorted(got.collect()) == sorted(want.collect())


def test_python_datasource_mixed_ipc_formats(spark, tmp_path):
    """File-format (ARROW1 magic) and stream-format shards coexist in
    one directory; the data source reads both."""
    table = pq.read_table(table_path(SF, "documents"))
    half = table.num_rows // 2
    with pa.ipc.new_file(
        str(tmp_path / "data-00000-of-00002.arrow"), table.schema
    ) as w:
        w.write_table(table.slice(0, half))
    with pa.ipc.new_stream(
        str(tmp_path / "data-00001-of-00002.arrow"), table.schema
    ) as w:
        w.write_table(table.slice(half))
    arrow_ipc.register_arrow_ipc_datasource(spark)
    got = spark.read.format("arrow_ipc").load(str(tmp_path))
    assert got.count() == table.num_rows
    assert got.select(F.sum("doc_id")).first()[0] == sum(
        table.column("doc_id").to_pylist()
    )


def test_datasource_writer_roundtrip_and_overwrite(spark, tmp_path):
    """df.write.format("arrow_ipc"): one HF-named shard per write
    task, publish-by-rename, overwrite replaces the previous shard
    set, and the round-trip is lossless."""
    import os

    out = str(tmp_path / "written")
    arrow_ipc.register_arrow_ipc_datasource(spark)
    want = spark.read.parquet(table_path(SF, "documents"))
    want.repartition(3).write.format("arrow_ipc").mode("overwrite").save(out)
    shards = sorted(os.listdir(out))
    assert shards == [f"data-{i:05d}-of-00003.arrow" for i in range(3)]
    got = spark.read.format("arrow_ipc").load(out)
    assert sorted(got.collect()) == sorted(want.collect())
    # overwrite with a different shard count replaces, never appends
    want.limit(10).repartition(2).write.format("arrow_ipc").mode(
        "overwrite"
    ).save(out)
    assert sorted(os.listdir(out)) == [
        f"data-{i:05d}-of-00002.arrow" for i in range(2)
    ]
    assert spark.read.format("arrow_ipc").load(out).count() == 10


def test_datasource_writer_append_offsets_shards(spark, tmp_path):
    """mode("append") must ADD shards after the existing ones (never
    clobber) and rename every shard to the new of-N suffix so the
    data-{i}-of-{total} naming contract stays true."""
    import pytest

    out = str(tmp_path / "appended")
    arrow_ipc.register_arrow_ipc_datasource(spark)
    want = spark.read.parquet(table_path(SF, "documents"))
    first = want.limit(20).repartition(2)
    first.write.format("arrow_ipc").mode("overwrite").save(out)
    second = want.where(F.col("doc_id") >= 400).repartition(3)
    second.write.format("arrow_ipc").mode("append").save(out)
    assert sorted(os.listdir(out)) == [
        f"data-{i:05d}-of-00005.arrow" for i in range(5)
    ]
    got = spark.read.format("arrow_ipc").load(out)
    assert got.count() == 20 + second.count()
    # empty / nonexistent shard dir surfaces as a clear error, not an
    # IndexError from inside schema inference
    with pytest.raises(Exception, match="no .arrow shards"):
        spark.read.format("arrow_ipc").load(str(tmp_path / "missing")).count()
