"""PII/toxicity scrub: a fold of built-in regexp_replace calls.

Pure JVM-side column expressions (north rule: zero per-row Python);
spec/scrub_spec.RULES is the single pattern source shared with the
DuckDB oracle and the pytest pure-Python oracle. Reference analog:
there is no scrub in fineweb-modal — this is the north-rule extension
— but the mechanism mirrors its filter stage shape (filter.py:50).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..spec import scrub_spec


def scrub_expr(col: Column) -> Column:
    out = col
    for _, pattern, repl in scrub_spec.RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def with_scrubbed(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed_text") -> DataFrame:
    # NULL text → '' (spec scrub_py(None) semantics)
    return df.withColumn(
        out_col, scrub_expr(F.coalesce(F.col(text_col), F.lit("")))
    )


def scrub_sql(col: str, d: str) -> str:
    """Render the same chain for either SQL dialect."""
    out = col
    for _, pattern, repl in scrub_spec.RULES:
        out = sd.regexp_replace_all(out, pattern, repl, d)
    return out
