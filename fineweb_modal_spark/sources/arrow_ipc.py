"""Arrow IPC shard source: a directory of `.arrow` files as a DataFrame.

The reference's chunker consumes HF-saved Arrow shards
(`data-00000-of-00138.arrow`, chunker.py:55,124) by assigning one file
per container. Spark has no built-in Arrow IPC reader, so this
connector re-expresses that fan-out Spark-side:

* the DRIVER touches only file NAMES (os.listdir) and ONE schema
  (first shard's header) — metadata-sized, never row data;
* the file list becomes a one-path-per-row DataFrame, repartitioned so
  each task owns ~one shard — the Spark analog of the reference's
  one-file-per-container map;
* `mapInPandas` opens its shard(s) with pyarrow and yields ONE pandas
  frame PER RECORD BATCH, so peak task memory is a batch, not a file.

Scale notes: parallelism is file-granular (an IPC *file*-format shard
is random-accessible per record batch, but a *stream*-format shard —
what HF writes — is not splittable), matching the reference's own
sharding contract: throughput scales with shard count. Column pruning
happens at the pyarrow layer via `columns=`; pass the projection down
rather than select()ing after the scan when reading wide shards.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def list_shards(shard_dir: str, suffix: str = ".arrow") -> list[str]:
    if not os.path.isdir(shard_dir):
        return []
    return sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(suffix)
    )


def _open_reader(path: str):
    """IPC file format (magic 'ARROW1') or stream format — both occur
    in the wild; HF `save_to_disk` writes stream-format `.arrow`."""
    import pyarrow as pa

    with open(path, "rb") as f:
        magic = f.read(6)
    if magic == b"ARROW1":
        return pa.ipc.open_file(pa.memory_map(path))
    return pa.ipc.open_stream(pa.input_stream(path))


def read_arrow_ipc(
    spark: SparkSession,
    shard_dir: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed scan over every `.arrow` shard in `shard_dir`."""
    from pyspark.sql.pandas.types import from_arrow_schema

    paths = list_shards(shard_dir)
    if not paths:
        raise FileNotFoundError(f"no .arrow shards under {shard_dir}")

    reader = _open_reader(paths[0])
    arrow_schema = reader.schema
    if columns is not None:
        import pyarrow as pa

        arrow_schema = pa.schema([arrow_schema.field(c) for c in columns])
    spark_schema = from_arrow_schema(arrow_schema)

    def scan(frames):
        for pdf in frames:
            for path in pdf["path"]:
                r = _open_reader(path)
                batches = (
                    (r.get_batch(i) for i in range(r.num_record_batches))
                    if hasattr(r, "num_record_batches")
                    else iter(r)
                )
                for batch in batches:
                    if columns is not None:
                        batch = batch.select(columns)
                    yield batch.to_pandas()

    files = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))
    return files.mapInPandas(scan, schema=spark_schema)


def make_arrow_ipc_datasource():
    """The same shard scan as a REAL Spark data source (PySpark 4
    Python Data Source API): `spark.dataSource.register(...)`, then

        spark.read.format("arrow_ipc").load(shard_dir)

    One `InputPartition` per shard file (the splittability contract of
    stream-format IPC — parallelism is file-granular, identical to
    `read_arrow_ipc`), and `read()` yields pyarrow RecordBatches
    directly — the Arrow-native fast path; no pandas hop, no row
    materialization. The driver touches only file names + one schema
    header. Built inside a factory so importing this module never
    requires the pyspark.sql.datasource symbols at module load."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Reader(DataSourceReader):
        def __init__(self, paths: list[str]):
            self._paths = paths

        def partitions(self):
            return [InputPartition(p) for p in self._paths]

        def read(self, partition):
            r = _open_reader(partition.value)
            if hasattr(r, "num_record_batches"):
                for i in range(r.num_record_batches):
                    yield r.get_batch(i)
            else:
                yield from r

    from pyspark.sql.datasource import (
        DataSourceArrowWriter,
        WriterCommitMessage,
    )

    class _ShardCommit(WriterCommitMessage):
        def __init__(self, tmp_path: str | None, n_rows: int):
            self.tmp_path = tmp_path
            self.n_rows = n_rows

    class _Writer(DataSourceArrowWriter):
        """Task-local stream-format shard + driver-side commit rename:
        each task streams its RecordBatches into `_tmp-<uuid>.arrow.tmp`
        (batch-at-a-time memory, no row materialization), returns the
        tmp path + row count as its commit message, and the driver's
        commit() renames the survivors to HF-style
        `data-{i:05d}-of-{n:05d}.arrow` — torn runs leave only `.arrow.tmp`
        files that list_shards() ignores, so readers never observe a
        partial write (the same publish-by-rename discipline as
        sinks.write_committed)."""

        def __init__(self, out_dir: str, overwrite: bool):
            self._out = out_dir
            self._overwrite = overwrite

        def write(self, batches):
            import uuid

            import pyarrow as pa

            os.makedirs(self._out, exist_ok=True)
            tmp, writer, n = None, None, 0
            for batch in batches:
                if writer is None:
                    tmp = os.path.join(
                        self._out, f"_tmp-{uuid.uuid4().hex}.arrow.tmp"
                    )
                    writer = pa.ipc.new_stream(tmp, batch.schema)
                writer.write_batch(batch)
                n += batch.num_rows
            if writer is not None:
                writer.close()
            return _ShardCommit(tmp, n)

        def commit(self, messages):
            tmps = [
                m.tmp_path
                for m in messages
                if m is not None and m.tmp_path
            ]
            existing: list[str] = []
            if self._overwrite:
                for f in list_shards(self._out):
                    os.remove(f)
            else:
                # append mode: new shards slot AFTER the existing ones
                # and every shard (old + new) is renamed to the new
                # of-N suffix so the directory's naming contract
                # (data-{i}-of-{total}) stays true. total grows, so
                # the new suffix never collides with an old name.
                existing = sorted(list_shards(self._out))
            total = len(existing) + len(tmps)
            for i, old in enumerate(existing):
                dst = os.path.join(
                    self._out, f"data-{i:05d}-of-{total:05d}.arrow"
                )
                if old != dst:
                    os.rename(old, dst)
            for j, tmp in enumerate(sorted(tmps)):
                i = len(existing) + j
                os.rename(
                    tmp,
                    os.path.join(
                        self._out, f"data-{i:05d}-of-{total:05d}.arrow"
                    ),
                )

        def abort(self, messages):
            for m in messages:
                if m is not None and getattr(m, "tmp_path", None):
                    try:
                        os.remove(m.tmp_path)
                    except OSError:
                        pass

    class _ArrowIPC(DataSource):
        @classmethod
        def name(cls) -> str:
            return "arrow_ipc"

        def schema(self):
            from pyspark.sql.pandas.types import from_arrow_schema

            path = self.options.get("path")
            if not path:
                raise ValueError("arrow_ipc requires .load(<shard_dir>)")
            shards = list_shards(path)
            if not shards:
                raise ValueError(
                    f"arrow_ipc: no .arrow shards under {path}"
                )
            return from_arrow_schema(_open_reader(shards[0]).schema)

        def reader(self, schema):
            return _Reader(list_shards(self.options["path"]))

        def writer(self, schema, overwrite: bool):
            path = self.options.get("path")
            if not path:
                raise ValueError("arrow_ipc requires .save(<shard_dir>)")
            return _Writer(path, overwrite)

    return _ArrowIPC


def register_arrow_ipc_datasource(spark: SparkSession) -> str:
    spark.dataSource.register(make_arrow_ipc_datasource())
    return "arrow_ipc"


def write_arrow_shards(
    parquet_path: str, out_dir: str, n_shards: int = 4
) -> list[str]:
    """Test-fixture generator: parquet table → HF-style stream-format
    shards `data-{i:05d}-of-{n:05d}.arrow`, rows round-robin by
    position (deterministic). Driver-side by design — it builds small
    local fixtures; at scale the shards already exist."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    table = pq.read_table(parquet_path)
    out = []
    for i in range(n_shards):
        shard = table.take(list(range(i, table.num_rows, n_shards)))
        path = os.path.join(out_dir, f"data-{i:05d}-of-{n_shards:05d}.arrow")
        with pa.ipc.new_stream(path, table.schema) as w:
            w.write_table(shard)
        out.append(path)
    return out
