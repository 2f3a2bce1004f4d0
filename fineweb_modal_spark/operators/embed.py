"""Embedding stage: iterator pandas UDF over Arrow batches.

The Spark-native form of the reference's embed DAG
(embed-tei.py:205-334, SURVEY.md §3.2): where the reference
length-sorts, greedily bin-packs, POSTs batches to a TEI server and
scatters results into an .npy memmap by original_position, here the
embedding is emitted as an `array<float>` COLUMN next to its key —
the positional join (J1) and the sidecar file disappear. Batch
homogeneity (the reason for the reference's packing) is optional
physical tuning: `sorted_for_batching` applies
sortWithinPartitions(length) ahead of the UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

from ..spec import embed_model


@pandas_udf(ArrayType(FloatType()))
def embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for texts in batches:
        mat = embed_model.embed_batch(texts.fillna("").tolist())
        yield pd.Series(list(mat))


def with_embedding(
    df: DataFrame, text_col: str = "text", out_col: str = "embedding"
) -> DataFrame:
    return df.withColumn(out_col, embed_udf(F.col(text_col)))


def sorted_for_batching(df: DataFrame, length_col: str) -> DataFrame:
    """Length-homogeneous Arrow batches (reference O1, embed-tei.py:215):
    no global sort — order matters only within a partition."""
    return df.sortWithinPartitions(length_col)
