"""Deterministic train/val/test sharding.

The last step before a corpus ships to training: assign every document
a split by hashing its STABLE identity — never `rand()`, never
row/partition position. The md5-bucket coin means the assignment is
(a) reproducible across runs, engines and cluster sizes, (b) stable
under repartition/compaction (a doc's split never changes when the
table is rewritten), and (c) exactly proportioned in expectation with
no shuffle: the split column is a row-local codegen expression, and
downstream writers just partition by it.

Same portable md5 hash as every dedup/sampling operator
(spec/hashing.py); the gate's DuckDB oracle re-derives the identical
assignment, so the per-split counts/checksums hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spec import hashing as H

S = H.SPARK

SPLIT_MOD = 1000
TRAIN_HI = 900  # [0, 900) -> train  (90%)
VAL_HI = 950  # [900, 950) -> val (5%), [950, 1000) -> test (5%)


def split_expr(d: str, id_col: str = "doc_id") -> str:
    """SQL fragment: 'train' | 'val' | 'test' from the stable id."""
    cast = "STRING" if d == S else "VARCHAR"
    h = H.md5_i64(f"'split:' || CAST({id_col} AS {cast})", d)
    return (
        f"CASE WHEN ({h}) % {SPLIT_MOD} < {TRAIN_HI} THEN 'train' "
        f"WHEN ({h}) % {SPLIT_MOD} < {VAL_HI} THEN 'val' "
        f"ELSE 'test' END"
    )


def assign_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """docs + a `split` column — pure row-local codegen, zero shuffle."""
    return docs.withColumn("split", F.expr(split_expr(S, id_col)))
