"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with metadata columns
beside them. The Spark-side plumbing is real and tested — schema,
Arrow batch shape, mapInPandas signature, partition behavior; the
actual media decode is a STUB (image/audio libraries are not in this
container): `decode_stub_udf` derives deterministic fake
width/height/checksum values from the bytes, and `decode_real` raises
NotImplementedError with the intended production signature.

The metadata path (byte length, magic prefix) is pure built-ins and
fully oracle-checked; the stub decode is ALSO oracle-checked because
its fake outputs are closed-form functions of the byte length —
proving the mapInPandas plumbing produces exactly the declared
values, not just "some rows".

Reference analog: the reference's opaque sidecar payloads (.npy
embeddings memmapped next to parquet, features.py:124-129) — here the
payload is a first-class column instead of a sidecar file.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def with_binary_meta(pages: DataFrame) -> DataFrame:
    """byte_len + magic prefix of the binary column — pure built-ins."""
    return pages.select(
        "doc_id",
        F.octet_length("html").alias("byte_len"),
        F.substring(F.hex("html"), 1, 8).alias("magic_hex"),
    )


def binary_meta_sql(d: str, html_expr: str) -> str:
    """Oracle over the same derived binary column (dialect-portable)."""
    return (
        f"SELECT doc_id, octet_length({html_expr}) AS byte_len, "
        f"substr(hex({html_expr}), 1, 8) AS magic_hex FROM documents"
    )


def _fake_decode(doc_ids: pd.Series, blobs: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for image decode: dims/checksum are pure
    functions of the payload length (see decode_stub_sql)."""
    lens = blobs.map(len).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": doc_ids.astype("int64"),
            "byte_len": lens,
            "width": (100 + lens % 100).astype("int32"),
            "height": (100 + lens % 77).astype("int32"),
            "checksum": (lens * 2654435761) % 1_000_000_007,
        }
    )


def decode_stub(pages: DataFrame) -> DataFrame:
    """mapInPandas decode over (doc_id, html) — Arrow-batched, 1→1."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode(pdf["doc_id"], pdf["html"])

    return pages.select("doc_id", "html").mapInPandas(fn, DECODE_SCHEMA)


def decode_stub_sql(d: str, html_expr: str) -> str:
    """Closed-form oracle for the stub decode outputs."""
    blen = f"octet_length({html_expr})"
    return f"""
SELECT doc_id,
       CAST({blen} AS BIGINT) AS byte_len,
       CAST(100 + {blen} % 100 AS INT) AS width,
       CAST(100 + {blen} % 77 AS INT) AS height,
       (CAST({blen} AS BIGINT) * 2654435761) % 1000000007 AS checksum
FROM documents
""".strip()


def decode_real(pages: DataFrame) -> DataFrame:  # pragma: no cover
    """Production decode (PIL/ffmpeg mapInPandas) — unavailable offline."""
    raise NotImplementedError(
        "media decode requires PIL/av which are not installed; "
        "use decode_stub for plumbing tests"
    )
