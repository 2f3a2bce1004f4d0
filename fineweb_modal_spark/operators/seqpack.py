"""GPT-style sequence packing: concat-and-chunk training layout.

The last step between a curated corpus and a pretraining run: every
document (plus one EOS token) is concatenated in a deterministic
corpus order and the token stream is chunked into fixed-length
training sequences of ``seq_len`` tokens. The layout is a pure
function of the per-document token counts and the order — no RNG, no
driver loop — so it is exactly reproducible by ANSI window SQL, and
a later job can hydrate any single sequence by reading only the
documents whose [start, end) token span intersects it.

The reference stops at per-chunk embeddings (embed-tei.py packs token
BUDGET batches, see binpack.py); this operator is the complementary
artifact for TRAINING shards: fixed-length sequences, document
boundaries preserved as (seq_first, offset_in_seq) coordinates.

Two paths share one arithmetic core:

- ``sequence_layout`` — oracle-grain: running token offsets via a
  window ``SUM ... ROWS UNBOUNDED PRECEDING`` partitioned by
  ``source`` (each source is packed as its own independent stream,
  the shard-per-source layout a real tokenization job uses). The
  per-source window parallelizes across sources but serializes
  within one, so it is the GATE path.
- ``sequence_layout_distributed`` — the 10^12-doc path: a classic
  two-phase distributed prefix sum. Range-partition by
  (source, doc_id), aggregate one (partition → token sum) row per
  partition (bounded collect: #partitions rows), broadcast the
  exclusive per-partition offsets back, and let each partition
  compute its rows' global offsets locally in one mapInPandas. No
  global sort, no single-partition window; equality with the window
  path is pytest-enforced (tests/test_seqpack.py).

Token counts use the engine's hermetic proxy (n_chars // 4 + 1
content tokens, + 1 EOS) so both dialects compute identical integers
without a tokenizer dependency; swap in real token counts from
``spec.tokenizer`` upstream without touching the layout math.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Fixed training context length (tokens per packed sequence).
SEQ_LEN = 2048

# tokens(doc) = n_chars // 4 + 1 content + 1 EOS  (hermetic proxy).
# DuckDB dialect: `//` is integer floor-div there (`/` promotes to
# DOUBLE), matching Spark-side F.floor(col / 4).
TOKENS_EXPR = "CAST(n_chars AS BIGINT) // 4 + 2"


def _tokens_col() -> F.Column:
    return (F.floor(F.col("n_chars").cast("long") / F.lit(4)) + F.lit(2)).cast(
        "long"
    )


LAYOUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("tok_count", LongType()),
        StructField("start_tok", LongType()),
        StructField("seq_first", LongType()),
        StructField("seq_last", LongType()),
        StructField("n_seqs", LongType()),
        StructField("offset_in_seq", LongType()),
    ]
)


def _finish_layout(df: DataFrame, seq_len: int) -> DataFrame:
    """start_tok → chunk coordinates (shared by both paths)."""
    end = F.col("start_tok") + F.col("tok_count") - F.lit(1)
    return (
        df.withColumn("seq_first", F.floor(F.col("start_tok") / seq_len))
        .withColumn("seq_last", F.floor(end / seq_len))
        .withColumn("n_seqs", F.col("seq_last") - F.col("seq_first") + 1)
        .withColumn("offset_in_seq", F.col("start_tok") % seq_len)
        .select(
            "doc_id",
            "source",
            "tok_count",
            "start_tok",
            "seq_first",
            "seq_last",
            "n_seqs",
            "offset_in_seq",
        )
    )


def sequence_layout(docs: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Per-document packed coordinates, one window per source stream."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = docs.select(
        "doc_id", "source", _tokens_col().alias("tok_count")
    ).withColumn(
        "start_tok", F.coalesce(F.sum("tok_count").over(w), F.lit(0))
    )
    return _finish_layout(base, seq_len)


def sequence_layout_distributed(
    docs: DataFrame, seq_len: int = SEQ_LEN, num_partitions: int = 32
) -> DataFrame:
    """Two-phase distributed prefix sum over (source, doc_id) order.

    Phase 1 computes one (partition_id, source, token_sum) row per
    partition×source run — at most ``num_partitions + #sources`` rows
    collected to the driver (metadata-sized; the corpus itself never
    moves). Phase 2 broadcasts the exclusive offsets and each
    partition assigns global start_tok locally. Range partitioning on
    (source, doc_id) guarantees every partition holds a contiguous
    slice of the global order, which is what makes the per-partition
    exclusive offset well-defined.
    """
    # localCheckpoint PINS the partitioning: repartitionByRange
    # re-samples range boundaries per job (Spark documents the output
    # as possibly inconsistent across runs), so without materializing
    # here the phase-1 sums job and the phase-2 assign job could cut
    # partitions differently and the (pid, source) offsets would be
    # keyed against the wrong membership. Checkpointing also means the
    # corpus-scale scan+shuffle happens once, not twice.
    arranged = (
        docs.select("doc_id", "source", _tokens_col().alias("tok_count"))
        .repartitionByRange(num_partitions, "source", "doc_id")
        .sortWithinPartitions("source", "doc_id")
        .localCheckpoint(eager=True)
    )

    part_schema = StructType(
        [
            StructField("pid", LongType()),
            StructField("source", StringType()),
            StructField("first_doc", LongType()),
            StructField("tok_sum", LongType()),
        ]
    )

    def part_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        g = pdf.groupby("source", sort=False).agg(
            first_doc=("doc_id", "min"), tok_sum=("tok_count", "sum")
        )
        g = g.reset_index()
        g.insert(0, "pid", pid)
        yield g.astype(
            {"pid": "int64", "first_doc": "int64", "tok_sum": "int64"}
        )

    sums = arranged.mapInPandas(part_sums, part_schema).collect()
    # Exclusive prefix per (source, partition-run), in global order.
    sums.sort(key=lambda r: (r["source"], r["first_doc"], r["pid"]))
    offsets: dict[tuple[int, str], int] = {}
    acc: dict[str, int] = {}
    for r in sums:
        offsets[(r["pid"], r["source"])] = acc.get(r["source"], 0)
        acc[r["source"]] = acc.get(r["source"], 0) + r["tok_sum"]

    bc = arranged.sparkSession.sparkContext.broadcast(offsets)

    base_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("tok_count", LongType()),
            StructField("start_tok", LongType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["source", "doc_id"]).reset_index(drop=True)
        run = pdf.groupby("source", sort=False)["tok_count"]
        local_excl = run.cumsum() - pdf["tok_count"]
        # strict lookup: phase 1 enumerated exactly the (pid, source)
        # runs this phase reads (the checkpoint pinned partitioning),
        # so a missing key means partition drift — fail loudly rather
        # than silently restarting a stream at offset 0
        starts = pdf["source"].map(
            lambda s: bc.value[(pid, s)]
        ).astype("int64")
        pdf["start_tok"] = (starts + local_excl).astype("int64")
        yield pdf[["doc_id", "source", "tok_count", "start_tok"]]

    base = arranged.mapInPandas(assign, base_schema)
    return _finish_layout(base, seq_len)


def source_totals(docs: DataFrame) -> DataFrame:
    """(source, tokens_so_far): the only state an incremental append
    needs — one row per source, persisted beside the packed shards."""
    return (
        docs.select("source", _tokens_col().alias("tok_count"))
        .groupBy("source")
        .agg(F.sum("tok_count").alias("tokens_so_far"))
    )


def sequence_layout_incremental(
    new_docs: DataFrame,
    prior_totals: DataFrame,
    seq_len: int = SEQ_LEN,
) -> DataFrame:
    """Append a new crawl batch to existing packed shards WITHOUT
    repacking: each source's stream continues at ``tokens_so_far``
    (broadcast join — the totals relation is |sources|-sized), so the
    delta layout is byte-identical to what a full repack of
    old ∪ new would assign to the new docs (pytest + gate enforced).
    The stored corpus is never re-read: this is the same
    delta-vs-stored-index shape as LSH admission and DSIR scoring."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = (
        new_docs.select(
            "doc_id", "source", _tokens_col().alias("tok_count")
        )
        .join(
            F.broadcast(
                prior_totals.select("source", "tokens_so_far")
            ),
            "source",
            "left",
        )
        .withColumn(
            "start_tok",
            F.coalesce(F.col("tokens_so_far"), F.lit(0))
            + F.coalesce(F.sum("tok_count").over(w), F.lit(0)),
        )
    )
    return _finish_layout(base, seq_len)


def hydrate_sequence(
    docs: DataFrame, seq_id: int, seq_len: int = SEQ_LEN
) -> DataFrame:
    """Which document slices make up training sequence ``seq_id`` of
    each source shard: (doc_id, slice token range within the doc,
    position within the sequence). The trainer-side read path — at
    scale the layout relation is partition-pruned by seq_first/
    seq_last so one sequence touches O(docs-in-sequence) rows."""
    lay = sequence_layout(docs, seq_len)
    s = F.lit(seq_id)
    lo = s * seq_len
    hi = (s + 1) * seq_len - 1
    end = F.col("start_tok") + F.col("tok_count") - 1
    return (
        lay.where(
            (F.col("seq_first") <= s) & (F.col("seq_last") >= s)
        )
        .select(
            "doc_id",
            "source",
            (F.greatest(lo, F.col("start_tok")) - F.col("start_tok"))
            .alias("doc_tok_from"),
            (F.least(hi, end) - F.col("start_tok")).alias("doc_tok_to"),
            (F.greatest(lo, F.col("start_tok")) - lo).alias("seq_pos"),
        )
        .orderBy("source", "doc_id")
    )


def pack_stats(docs: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Per-source shard report: sequence count, boundary crossings,
    tail padding, fill ratio — the numbers a tokenization job logs
    per output shard."""
    lay = sequence_layout(docs, seq_len)
    return (
        lay.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok_count").alias("total_tokens"),
            (F.max("seq_last") + 1).alias("n_sequences"),
            F.sum((F.col("n_seqs") > 1).cast("long")).alias(
                "docs_crossing"
            ),
            (
                (F.max("seq_last") + 1) * seq_len - F.sum("tok_count")
            ).alias("tail_padding"),
            F.round(
                F.sum("tok_count")
                / ((F.max("seq_last") + 1) * F.lit(seq_len)),
                6,
            ).alias("fill_ratio"),
        )
        .orderBy("source")
    )


def layout_oracle_sql(seq_len: int = SEQ_LEN, table: str = "documents") -> str:
    """DuckDB mirror of ``sequence_layout`` (integer-exact)."""
    return f"""
WITH base AS (
  SELECT doc_id, source,
         CAST({TOKENS_EXPR} AS BIGINT) AS tok_count
  FROM {table}
), off AS (
  SELECT doc_id, source, tok_count,
         -- SUM(BIGINT) is HUGEINT in DuckDB and degrades to float64
         -- through the driver's pandas fetch — cast back to BIGINT
         CAST(COALESCE(SUM(tok_count) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_tok
  FROM base
)
SELECT doc_id, source, tok_count, start_tok,
       start_tok // {seq_len} AS seq_first,
       (start_tok + tok_count - 1) // {seq_len} AS seq_last,
       (start_tok + tok_count - 1) // {seq_len}
         - start_tok // {seq_len} + 1 AS n_seqs,
       start_tok % {seq_len} AS offset_in_seq
FROM off
"""


def incremental_oracle_sql(
    split_doc_id: int, seq_len: int = SEQ_LEN, table: str = "documents"
) -> str:
    """Oracle for the incremental gate: the FULL-corpus layout
    filtered to the delta batch — incremental append must be
    indistinguishable from a full repack on the new docs."""
    return f"""
WITH full_layout AS ({layout_oracle_sql(seq_len, table)})
SELECT * FROM full_layout WHERE doc_id >= {split_doc_id}
"""


def hydrate_oracle_sql(
    seq_id: int, seq_len: int = SEQ_LEN, table: str = "documents"
) -> str:
    """DuckDB mirror of ``hydrate_sequence``."""
    lo = seq_id * seq_len
    hi = (seq_id + 1) * seq_len - 1
    return f"""
WITH lay AS ({layout_oracle_sql(seq_len, table)})
SELECT doc_id, source,
       greatest({lo}, start_tok) - start_tok AS doc_tok_from,
       least({hi}, start_tok + tok_count - 1) - start_tok AS doc_tok_to,
       greatest({lo}, start_tok) - {lo} AS seq_pos
FROM lay
WHERE seq_first <= {seq_id} AND seq_last >= {seq_id}
ORDER BY source, doc_id
"""


def stats_oracle_sql(seq_len: int = SEQ_LEN, table: str = "documents") -> str:
    """DuckDB mirror of ``pack_stats``."""
    return f"""
WITH lay AS ({layout_oracle_sql(seq_len, table)})
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(tok_count) AS BIGINT) AS total_tokens,
       MAX(seq_last) + 1 AS n_sequences,
       CAST(SUM(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_crossing,
       CAST((MAX(seq_last) + 1) * {seq_len} - SUM(tok_count) AS BIGINT)
         AS tail_padding,
       ROUND(CAST(SUM(tok_count) AS DOUBLE)
             / ((MAX(seq_last) + 1) * {seq_len}), 6) AS fill_ratio
FROM lay
GROUP BY source
ORDER BY source
"""
