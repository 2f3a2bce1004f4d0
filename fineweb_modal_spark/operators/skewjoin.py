"""Explicit salted join for skewed keys (north rule: host-level skew).

AQE's skew-join split handles most runtime skew; this operator is the
EXPLICIT form for the planner-visible case — a join key where one
value dominates (pages.py deliberately routes ~1/3 of urls to host
h0). The big side salts each row by a hash of a unique column; the
small side replicates once per salt; the join key becomes
(key, salt), so the hot key spreads over n_salts tasks. Result set is
byte-identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """big ⋈ small on `key`, salted over n_salts buckets.

    unique_col: any (near-)unique big-side column — the salt must be
    deterministic (re-runnable stages) yet uniform, so it hashes that
    column rather than using rand().
    """
    b = big.withColumn("__salt", F.pmod(F.xxhash64(unique_col), F.lit(n_salts)))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")
