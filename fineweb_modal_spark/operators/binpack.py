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
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
        rows_ids: list[int] = []
        rows_cnt: list[int] = []
        out_batch: list[int] = []
        local = 0
        cur_ids: list[int] = []
        cur_cnts: list[int] = []

        def flush():
            nonlocal local
            if not cur_ids:
                return
            bid = (pid << 20) | local
            rows_ids.extend(cur_ids)
            rows_cnt.extend(cur_cnts)
            out_batch.extend([bid] * len(cur_ids))
            local += 1
            cur_ids.clear()
            cur_cnts.clear()

        for pdf in batches:
            for did, cnt in zip(pdf["doc_id"], pdf[count_col]):
                cnt = int(cnt)
                new_max = max(cur_cnts + [cnt]) if cur_cnts else cnt
                if cur_ids and new_max * (len(cur_ids) + 1) > budget:
                    flush()
                cur_ids.append(int(did))
                cur_cnts.append(cnt)
        flush()
        df = pd.DataFrame(
            {
                "doc_id": pd.Series(rows_ids, dtype="int64"),
                "token_count": pd.Series(rows_cnt, dtype="int64"),
                "batch_id": pd.Series(out_batch, dtype="int64"),
            }
        )
        if len(df):
            g = df.groupby("batch_id")["token_count"]
            df["batch_max_tokens"] = g.transform("max").astype("int64")
            df["batch_size"] = g.transform("size").astype("int32")
        else:
            df["batch_max_tokens"] = pd.Series([], dtype="int64")
            df["batch_size"] = pd.Series([], dtype="int32")
        yield df

    arranged = docs.repartitionByRange(
        num_partitions, F.col(count_col), F.col("doc_id")
    ).sortWithinPartitions(count_col, "doc_id")
    return arranged.select("doc_id", count_col).mapInPandas(pack, PACK_SCHEMA)
