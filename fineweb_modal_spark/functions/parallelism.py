"""Scan-parallelism guard shared by compute-heavy operators.

Small/few-file inputs yield fewer scan splits than cores, which quietly
serializes expression-heavy stages (the LSH corpus is ONE parquet file
→ 2 partitions → the md5 shingle hashing ran on 2 of 32 cores). At
corpus scale (many ~128 MiB splits) the check is a no-op, so the
round-robin shuffle only ever happens when it is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    if df.isStreaming:  # micro-batch sizing is the trigger's concern
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # File count from the scan's FileIndex — unlike df.rdd.getNumPartitions()
    # this never compiles the plan to an RDD on the driver. Non-file
    # relations report no files; leave those alone (no signal → no shuffle).
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df
