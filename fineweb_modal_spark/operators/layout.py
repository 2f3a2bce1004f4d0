"""Z-order (Morton) data layout for multi-dimensional locality.

The lakehouse layout technique Spark has no built-in for: interleave
the bits of two clustering dimensions into one Morton code, then
range-partition + sort by it. Files then hold rectangles of the
(x, y) space instead of stripes of one dimension, so min/max file
statistics prune BOTH predicates — a range query on either (or both)
dimensions touches O(√files) instead of all of them. Used by every
production table-format optimizer; here it is a pure integer column
expression (codegen, zero Python) plus the usual repartitionByRange.

The z-value is exact integer arithmetic (shift/mask/sum), rendered
identically for Spark and the DuckDB oracle, so the gate hash-checks
the full curve; the layout step itself (range partition + sort) is
physical and covered by tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd

Z_BITS = 16  # bits per dimension -> 32-bit Morton code


def zvalue_sql(x: str, y: str, d: str, bits: int = Z_BITS) -> str:
    """Morton code of two non-negative ints, low `bits` bits each.
    Spark uses shiftright/shiftleft functions; DuckDB uses >>/<<."""
    terms = []
    for i in range(bits):
        if d == sd.SPARK:
            xbit = f"(shiftright({x}, {i}) & 1)"
            ybit = f"(shiftright({y}, {i}) & 1)"
            terms.append(f"shiftleft({xbit}, {2 * i})")
            terms.append(f"shiftleft({ybit}, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zvalue_py(x: int, y: int, bits: int = Z_BITS) -> int:
    """Pure-Python mirror for the pytest oracle."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def with_zvalue(
    df: DataFrame, x_col: str, y_col: str, bits: int = Z_BITS
) -> DataFrame:
    return df.withColumn(
        "zval",
        F.expr(zvalue_sql(x_col, y_col, sd.SPARK, bits)).cast("bigint"),
    )


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, n_files: int = 32
) -> DataFrame:
    """The write-side layout: range-partition + sort by the Morton
    code so each output file holds a contiguous z-range (a rectangle
    of the key space). Pair with a partitioned/bucketed sink."""
    z = with_zvalue(df, x_col, y_col)
    return z.repartitionByRange(n_files, "zval").sortWithinPartitions("zval")
