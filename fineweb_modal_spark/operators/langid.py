"""Language-ID stage: iterator pandas UDF over Arrow batches.

The Spark-native form of the reference's load-model-once-per-container
batched inference (features.py:92-101 `@enter` + 135-145 batch loop;
embed-tei.py:155-176): the weight matrix is built once per task from
spec/langid_model.py (a pure function — cheaper to rebuild than to
broadcast 256 KiB), then every Arrow batch is scored vectorized in
numpy. Zero per-row Python at the DataFrame level (north rule).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import FloatType, StringType, StructField, StructType

from ..spec import langid_model

_RESULT_TYPE = StructType(
    [
        StructField("lang_pred", StringType()),
        StructField("lang_conf", FloatType()),
    ]
)


@pandas_udf(_RESULT_TYPE)
def langid_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    W = langid_model.build_weights()  # once per task, reused across batches
    for texts in batches:
        preds, confs = langid_model.predict_batch(
            texts.fillna("").tolist(), W
        )
        yield pd.DataFrame({"lang_pred": preds, "lang_conf": confs})


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append lang_pred / lang_conf columns."""
    out = df.withColumn("__lid", langid_udf(F.col(text_col)))
    return out.withColumn("lang_pred", F.col("__lid.lang_pred")).withColumn(
        "lang_conf", F.col("__lid.lang_conf")
    ).drop("__lid")
