"""Fused chunk→embed: ONE mapInPandas instead of two Python stages.

The reference runs chunking and embedding as separate jobs with a
volume round-trip between them (chunker.py → embed-tei.py,
SURVEY.md §3.1-3.2). The unfused Spark form (chunker mapInPandas →
embed pandas UDF) already collapses the round-trip but still pays two
Python worker sets and two Arrow transfers per task; this operator
emits chunks WITH their embeddings from a single Arrow stage — the
same fusion lesson as operators/scoring.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..spec import embed_model
from ..spec import tokenizer as tok

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_index", IntegerType()),
        StructField("chunk_text", StringType()),
        StructField("chunk_token_count", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
        # exact Σc² of the pre-normalization integer bucket counts:
        # lets downstream gates recover the exact counts from the
        # float vector (c_j = round(v_j·√norm_sq)) for float-parity-
        # free oracle comparison
        StructField("norm_sq", LongType()),
    ]
)


def chunk_and_embed(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) → chunk rows with embeddings, one Python stage."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            texts: list[str] = []
            counts: list[int] = []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                for ch in tok.chunk_text(text if text is not None else ""):
                    ids.append(int(did))
                    idxs.append(ch["chunk_index"])
                    texts.append(ch["chunk_text"])
                    counts.append(ch["chunk_token_count"])
            mat, norm_sqs, _sigs = embed_model.embed_batch_with_sig(texts)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_index": pd.Series(idxs, dtype="int32"),
                    "chunk_text": texts,
                    "chunk_token_count": pd.Series(counts, dtype="int32"),
                    "embedding": list(mat),
                    "norm_sq": pd.Series(norm_sqs, dtype="int64"),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(fn, SCHEMA)
