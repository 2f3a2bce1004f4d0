"""Char-bigram perplexity stage (KenLM-style stand-in) — Arrow UDF.

Same execution shape as operators/langid.py: log-prob table built once
per task from spec/quality_rules.py (pure function of the repo), then
vectorized numpy scoring per Arrow batch. Reference analog: the
batched model inference of features.py:135-145.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..spec import quality_rules as qr


# DataType object (not DDL string): decoration must not need a live session
@pandas_udf(DoubleType())
def perplexity_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    logp = qr.build_bigram_logprobs()  # once per task
    for texts in batches:
        yield pd.Series(qr.perplexity_batch(texts.fillna("").tolist(), logp))


def with_perplexity(df: DataFrame, text_col: str = "text", out_col: str = "ppl") -> DataFrame:
    return df.withColumn(out_col, perplexity_udf(F.col(text_col)))
