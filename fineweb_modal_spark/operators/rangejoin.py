"""Bucketed range join — points × intervals without a BNLJ.

Spark has no native range join: `p.ts BETWEEN i.start AND i.end` is a
non-equi condition, so Catalyst falls back to BroadcastNestedLoopJoin
(O(P·I) comparisons — unusable once either side is large). The scale
pattern (same as Databricks' range-join optimization and KDB/kdb+
window joins) is to discretize time into fixed buckets:

* each interval EXPLODES to every bucket it covers
  (sequence(floor(start/w), floor(end/w)) — row-local);
* each point maps to its ONE bucket (floor(ts/w));
* an ordinary equi-join on the bucket co-locates every candidate
  pair, and the exact BETWEEN predicate refines.

Because a point lives in exactly one bucket, each qualifying
(point, interval) pair meets exactly once — no post-join distinct.
Cost: one shuffle on the bucket key; interval replication factor is
len/w + 1, so w tunes replication vs bucket width (pick w ≈ median
interval length; skewed hot buckets fall to AQE skew-join handling).

Reference analog: none — briefing extension (as-of join ✓
operators/asof.py, range join: this module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET_S = 1800


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_s: int = DEFAULT_BUCKET_S,
    how: str = "inner",
) -> DataFrame:
    """Rows of points × intervals with start ≤ ts ≤ end (inclusive,
    the BETWEEN convention). Column sets must be disjoint."""
    p = points.withColumn(
        "__bkt", (F.unix_timestamp(ts_col) / bucket_s).cast("long")
    )
    i = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / bucket_s).cast("long"),
                (F.unix_timestamp(end_col) / bucket_s).cast("long"),
            )
        ),
    )
    joined = p.join(i, "__bkt", how).where(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bkt")
