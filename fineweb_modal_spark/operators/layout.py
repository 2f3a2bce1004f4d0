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


# ---------------------------------------------------------------------------
# Host-skew write planning
# ---------------------------------------------------------------------------
#
# The north rule demands "explicit salting/repartition for host-level
# skew" on the write path. The salted writer exists (sinks.py salt
# contract; salted_skew_join proves result invariance) — this is the
# PLANNING half: derive, from the corpus itself, WHICH hosts need a
# salt and how large, so the write job can size sub-partitions before
# it shuffles. All integer math (floor-div shares, ceil-div salt), so
# both engines agree bit-for-bit and no float boundary flips a salt
# factor.

SKEW_TARGET_PARTITIONS = 64  # ideal write-task count the salt aims at


def host_skew_report(
    pages: DataFrame, target: int = SKEW_TARGET_PARTITIONS
) -> DataFrame:
    """(host, n_pages, share_ppm, salt_factor, is_hot) per host.

    salt_factor = ceil(n_pages * target / total): the number of
    sub-partitions that keep every write task near total/target rows.
    One groupBy(host) partial agg; the total joins back as a
    broadcast 1-row relation — host cardinality is web-scale-bounded
    (millions), the corpus never reshuffles."""
    from . import blocklist

    counts = (
        blocklist.with_host(pages)
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    tot = counts.agg(F.sum("n_pages").alias("total"))
    j = counts.crossJoin(F.broadcast(tot))
    salt = F.expr(f"CAST((n_pages * {target} + total - 1) DIV total AS BIGINT)")
    return j.select(
        "host",
        "n_pages",
        F.expr("CAST((n_pages * 1000000) DIV total AS BIGINT)").alias(
            "share_ppm"
        ),
        salt.alias("salt_factor"),
        (salt > 1).alias("is_hot"),
    )


def host_skew_report_sql(
    d: str, pages_select: str, target: int = SKEW_TARGET_PARTITIONS
) -> str:
    from . import blocklist

    div = "DIV" if d == sd.SPARK else "//"
    host = blocklist.host_sql("url", d)
    return f"""
WITH pages AS ({pages_select}),
counts AS (
  SELECT {host} AS host, COUNT(*) AS n_pages FROM pages GROUP BY 1
),
tot AS (SELECT SUM(n_pages) AS total FROM counts)
SELECT host, CAST(n_pages AS BIGINT) AS n_pages,
       CAST((n_pages * 1000000) {div} total AS BIGINT) AS share_ppm,
       CAST((n_pages * {target} + total - 1) {div} total AS BIGINT)
         AS salt_factor,
       ((n_pages * {target} + total - 1) {div} total) > 1 AS is_hot
FROM counts, tot
""".strip()
