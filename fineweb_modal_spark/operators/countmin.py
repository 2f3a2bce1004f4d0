"""Count-min sketch — approximate token frequencies in fixed memory.

Corpus-wide token statistics at 100 TB (vocab curves, stop-list
candidates, contamination probes) don't need the exact multi-billion
row `groupBy(token)` — a count-min sketch answers point frequency
queries with a FIXED d×w counter grid: build is a partial agg into
at most d·w cells per map task (one shuffle of ≤ d·w rows per task),
estimation is `min` over a key's d counters. Estimates only ever
OVER-count (collisions add), never under — the safe direction for
heavy-hitter screens.

Like operators/bloom.py, positions use the portable salted 60-bit
md5 hash, so build and estimate re-derive bit-identically in DuckDB
and the gate hash-checks the estimates themselves.

Sizing: w ≥ e/ε bounds overestimate ≤ ε·N with prob 1−(1/2)^d.
Defaults (d=4, w=8192) fit the fixture corpus; production sizes w up
by the same plan shape (the grid stays ≪ executor memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..spec import hashing as H

CMS_D = 4  # rows (independent hash functions)
CMS_W = 8192  # counters per row


def _col_sql(key_expr: str, i: int, d: str) -> str:
    cast = "STRING" if d == sd.SPARK else "VARCHAR"
    h = H.md5_i64(f"'cms{i}:' || CAST({key_expr} AS {cast})", d)
    return f"(({h}) % {CMS_W})"


def build_cms(df: DataFrame, key_col: str, weight_expr: str = "1") -> DataFrame:
    """(row_idx, col_idx, cnt): the sketch's nonzero cells.

    Row-local position expansion (d rows per key) → two-phase count
    agg on (row, col): every map task emits at most d·w partial
    cells no matter how many or how skewed the keys."""
    cells = df.select(
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct(CAST({i} AS INT) AS row_idx, "
                    f"CAST({_col_sql(key_col, i, sd.SPARK)} AS INT) AS col_idx, "
                    f"CAST({weight_expr} AS BIGINT) AS w)"
                    for i in range(CMS_D)
                )
                + ")"
            )
        ).alias("c")
    ).select("c.row_idx", "c.col_idx", "c.w")
    return cells.groupBy("row_idx", "col_idx").agg(
        F.sum("w").alias("cnt")
    )


def estimate(keys: DataFrame, cms: DataFrame, key_col: str) -> DataFrame:
    """keys + est: min over the key's d counters (broadcast join of
    the ≤ d·w-cell grid; absent cells count 0)."""
    probes = keys.select(
        key_col,
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct(CAST({i} AS INT) AS row_idx, "
                    f"CAST({_col_sql(key_col, i, sd.SPARK)} AS INT) AS col_idx)"
                    for i in range(CMS_D)
                )
                + ")"
            )
        ).alias("p"),
    ).select(key_col, "p.row_idx", "p.col_idx")
    joined = probes.join(F.broadcast(cms), ["row_idx", "col_idx"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def estimate_oracle_sql(
    items_sql: str, keys_sql: str, key_col: str, d: str = sd.DUCKDB
) -> str:
    """DuckDB re-derivation of build + estimate over the same hash
    arithmetic. items_sql: one row per occurrence (the multiset);
    keys_sql: the distinct keys to estimate."""
    cell_rows = " UNION ALL ".join(
        f"SELECT {i} AS row_idx, {_col_sql(key_col, i, d)} AS col_idx FROM items"
        for i in range(CMS_D)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {key_col}, {i} AS row_idx, {_col_sql(key_col, i, d)} AS col_idx FROM keys"
        for i in range(CMS_D)
    )
    return f"""
WITH items AS ({items_sql}),
keys AS ({keys_sql}),
cells AS ({cell_rows}),
cms AS (
  SELECT row_idx, col_idx, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY 1, 2
),
probes AS ({probe_rows})
SELECT p.{key_col}, min(coalesce(c.cnt, 0)) AS est
FROM probes p
LEFT JOIN cms c ON c.row_idx = p.row_idx AND c.col_idx = p.col_idx
GROUP BY p.{key_col}
""".strip()
