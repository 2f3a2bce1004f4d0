"""Greedy token-budget bin-packing (reference U6, embed-tei.py:218-274).

The reference sorts chunks by token count and packs them into batches
while `max(count)·len(batch) ≤ budget` to minimize padding waste on
the embedding server. In Spark this is a purely PHYSICAL concern:
range-partition by token count (so each partition holds similar
lengths), sort within partitions, then pack greedily inside a
mapInPandas — no global order, no driver loop, deterministic given
the range partitioning.

batch_id is (partition_id << 20) | local_batch — stable across runs
because repartitionByRange on (token_count, doc_id) is deterministic
for a fixed partition count.

Two entry points share ONE greedy core (`_greedy_locals`):

- `pack_batches` — the scale path. repartitionByRange boundaries come
  from Spark's sampler, so the exact partition membership is not
  reproducible outside Spark; the gate for this path is
  invariant-based (tests/test_toolbox.py: budget respected,
  conservation, batch stats consistent).
- `pack_batches_deterministic` — the oracle-grain path. Partition
  assignment is an EXPLICIT ntile over the global
  (token_count, doc_id) order — standard SQL, so DuckDB reproduces
  the FULL packing (partition → greedy batch boundaries → batch
  stats) with a recursive CTE (`pack_oracle_sql`) and the gate
  hash-checks the exact greedy rule the scale path runs. The global
  ntile window is a single-partition sort — acceptable at gate grain
  only; at corpus scale use `pack_batches`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

# reference: CLIENT_BATCH_TOKEN_LIMIT = 768*512 (embed-tei.py:79-81)
TOKEN_BUDGET = 768 * 512

PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("token_count", LongType()),
        StructField("batch_id", LongType()),
        StructField("batch_max_tokens", LongType()),
        StructField("batch_size", IntegerType()),
    ]
)

# batch_id = part * PART_STRIDE + local_batch (multiplication, not a
# bit-op, so the DuckDB oracle renders the identical arithmetic)
PART_STRIDE = 1 << 20


def _greedy_locals(cnts: list[int], budget: int) -> list[int]:
    """Local batch index per row of one partition, rows already in
    packing order. Greedy rule (embed-tei.py:218-274): start a new
    batch when max(batch ∪ {next}) · (len(batch)+1) > budget."""
    out: list[int] = []
    local = 0
    cur_max = 0
    cur_n = 0
    for cnt in cnts:
        cnt = int(cnt)
        if cur_n and max(cur_max, cnt) * (cur_n + 1) > budget:
            local += 1
            cur_max = 0
            cur_n = 0
        cur_max = max(cur_max, cnt)
        cur_n += 1
        out.append(local)
    return out


def _with_batch_stats(df: pd.DataFrame) -> pd.DataFrame:
    if len(df):
        g = df.groupby("batch_id")["token_count"]
        df["batch_max_tokens"] = g.transform("max").astype("int64")
        df["batch_size"] = g.transform("size").astype("int32")
    else:
        df["batch_max_tokens"] = pd.Series([], dtype="int64")
        df["batch_size"] = pd.Series([], dtype="int32")
    return df


def pack_batches(
    docs: DataFrame,
    count_col: str = "token_count",
    budget: int = TOKEN_BUDGET,
    num_partitions: int = 32,
) -> DataFrame:
    """(doc_id, token_count, batch_id, batch_max_tokens, batch_size)."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        ids: list[int] = []
        cnts: list[int] = []
        for pdf in batches:
            ids.extend(int(x) for x in pdf["doc_id"])
            cnts.extend(int(x) for x in pdf[count_col])
        locals_ = _greedy_locals(cnts, budget)
        df = pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "token_count": pd.Series(cnts, dtype="int64"),
                "batch_id": pd.Series(
                    [pid * PART_STRIDE + b for b in locals_], dtype="int64"
                ),
            }
        )
        yield _with_batch_stats(df)

    arranged = docs.repartitionByRange(
        num_partitions, F.col(count_col), F.col("doc_id")
    ).sortWithinPartitions(count_col, "doc_id")
    return arranged.select("doc_id", count_col).mapInPandas(pack, PACK_SCHEMA)


def pack_batches_deterministic(
    docs: DataFrame,
    count_col: str = "token_count",
    budget: int = TOKEN_BUDGET,
    num_parts: int = 32,
) -> DataFrame:
    """Oracle-grain packing: ntile(num_parts) over the global
    (token_count, doc_id) order replaces sampled range boundaries, so
    the packing — same greedy core as `pack_batches` — is exactly
    reproducible by `pack_oracle_sql`'s recursive CTE."""
    parted = docs.select(
        "doc_id", F.col(count_col).cast("long").alias("token_count")
    ).withColumn(
        "part",
        F.ntile(num_parts).over(Window.orderBy("token_count", "doc_id")),
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["token_count", "doc_id"]).reset_index(
            drop=True
        )
        part = int(pdf["part"].iloc[0])
        locals_ = _greedy_locals(list(pdf["token_count"]), budget)
        df = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "token_count": pdf["token_count"].astype("int64"),
                "batch_id": pd.Series(
                    [part * PART_STRIDE + b for b in locals_], dtype="int64"
                ),
            }
        )
        return _with_batch_stats(df)

    return parted.groupBy("part").applyInPandas(pack_group, PACK_SCHEMA)


def pack_oracle_sql(
    table: str = "documents",
    count_expr: str = "n_chars",
    budget: int = TOKEN_BUDGET,
    num_parts: int = 32,
) -> str:
    """DuckDB mirror of `pack_batches_deterministic`: ntile partition
    assignment, then the greedy rule unrolled as a recursive CTE that
    advances every partition one row per step carrying
    (batch_local, cur_max, cur_size) — the exact loop state of
    `_greedy_locals`. Exact integer arithmetic throughout."""
    grow = (
        f"greatest(r.cur_max, b.token_count) * (r.cur_size + 1) > {budget}"
    )
    return f"""
WITH RECURSIVE base0 AS (
  SELECT doc_id, CAST({count_expr} AS BIGINT) AS token_count,
         ntile({num_parts}) OVER (
           ORDER BY CAST({count_expr} AS BIGINT), doc_id) AS part
  FROM {table}
), base AS (
  SELECT doc_id, token_count, part,
         row_number() OVER (
           PARTITION BY part ORDER BY token_count, doc_id) AS rn
  FROM base0
), rec AS (
  SELECT part, rn, doc_id, token_count,
         CAST(0 AS BIGINT) AS batch_local,
         token_count AS cur_max,
         CAST(1 AS BIGINT) AS cur_size
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.part, b.rn, b.doc_id, b.token_count,
         CASE WHEN {grow} THEN r.batch_local + 1
              ELSE r.batch_local END,
         CASE WHEN {grow} THEN b.token_count
              ELSE greatest(r.cur_max, b.token_count) END,
         CASE WHEN {grow} THEN CAST(1 AS BIGINT)
              ELSE r.cur_size + 1 END
  FROM rec r JOIN base b ON b.part = r.part AND b.rn = r.rn + 1
), packed AS (
  SELECT doc_id, token_count,
         CAST(part AS BIGINT) * {PART_STRIDE} + batch_local AS batch_id
  FROM rec
)
SELECT doc_id, token_count, batch_id,
       max(token_count) OVER (PARTITION BY batch_id) AS batch_max_tokens,
       CAST(count(*) OVER (PARTITION BY batch_id) AS INTEGER)
         AS batch_size
FROM packed
"""
