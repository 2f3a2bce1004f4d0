"""Fixed-width histogram quantile sketch — mergeable approximate
percentiles in fixed memory.

Completes the sketch quartet (count-min: frequency, Bloom: membership,
HLL: distinct, here: quantiles). Exact `percentile` shuffles and sorts
every value per group; the histogram keeps ONE counter per
(group, bin) — a two-phase count partial agg, mergeable across shards
by plain sum, with max error W/2 per estimate. The classic
scale-vs-precision trade for monitoring-grade percentiles over 100-TB
columns (p50/p99 doc length per crawl, latency SLOs).

Determinism: bins are `floor(x / W)` (exact for integer inputs), bin
counts are integers, and the interpolation
    est = lo + W * (q·n − cum_before) / cnt
selects exactly ONE bin per quantile (the bin where the cumulative
count first reaches q·n: cum_before < q·n ≤ cum), so every arithmetic
step is an identically-ordered IEEE op on both engines and the gate
hash-pins the ESTIMATES, like operators/hll.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HIST_W = 16  # bin width; error <= W/2 = 8 on doc-length-scale columns


def build_bins(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """(group_cols..., bin, cnt): the sketch — one counter per nonzero
    bin, mergeable by sum on (group, bin)."""
    return (
        df.select(
            *group_cols,
            F.floor(F.col(value_col) / F.lit(HIST_W)).alias("bin"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def quantiles(bins: DataFrame, qs: list[float]) -> DataFrame:
    """(group_cols..., n, p<q> ...): interpolated quantile estimates.

    Runs over the (tiny) bin relation: one window pass for cumulative
    counts, then each quantile picks its unique straddling bin."""
    gcols = [c for c in bins.columns if c not in ("bin", "cnt")]
    w = Window.partitionBy(*gcols).orderBy("bin")
    wall = Window.partitionBy(*gcols)
    cum = (
        bins.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("cb", F.col("cum") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(wall))
    )
    aggs = [F.max("n").alias("n")]
    for q in qs:
        th = F.col("n") * F.lit(q)
        est = F.when(
            (F.col("cb") < th) & (F.col("cum") >= th),
            F.col("bin") * HIST_W
            + HIST_W * (th - F.col("cb")) / F.col("cnt"),
        )
        aggs.append(
            F.round(F.max(est), 6).alias(f"p{round(q * 100)}")
        )
    return cum.groupBy(*gcols).agg(*aggs)


def quantiles_oracle_sql(
    items_sql: str, value_col: str, group_col: str, qs: list[float]
) -> str:
    """DuckDB re-derivation: same bins, same cumulative window, same
    single-straddling-bin interpolation."""
    qcols = ",\n       ".join(
        f"round(max(CASE WHEN cb < n * {q} AND cum >= n * {q} "
        f"THEN bin * {HIST_W} + {HIST_W} * (n * {q} - cb) / cnt END), 6) "
        f"AS p{round(q * 100)}"
        for q in qs
    )
    return f"""
WITH items AS ({items_sql}),
bins AS (
  SELECT {group_col} AS grp, CAST(floor({value_col} / {HIST_W}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM items GROUP BY 1, 2
),
cumed AS (
  SELECT grp, bin, cnt,
         sum(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY grp ORDER BY bin) - cnt AS cb,
         sum(cnt) OVER (PARTITION BY grp) AS n
  FROM bins
)
SELECT grp, CAST(max(n) AS BIGINT) AS n,
       {qcols}
FROM cumed GROUP BY grp
""".strip()


def crossing_bin(
    bins: DataFrame, q_num: int = 1, q_den: int = 4
) -> DataFrame:
    """(group_cols..., thr_bin): smallest bin whose cumulative count
    reaches q_num/q_den of the group total — the INTEGER-EXACT
    quantile crossing (q_den*cum >= q_num*n, no float interpolation),
    so an engine and an oracle can never disagree on a boundary row.

    Runs entirely over the tiny (group, bin, cnt) sketch relation."""
    gcols = [c for c in bins.columns if c not in ("bin", "cnt")]
    w = Window.partitionBy(*gcols).orderBy("bin")
    wall = Window.partitionBy(*gcols)
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    return (
        cum.where(F.lit(q_den) * F.col("cum") >= F.lit(q_num) * F.col("n"))
        .groupBy(*gcols)
        .agg(F.min("bin").alias("thr_bin"))
    )


def adaptive_cutoff_filter(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    q_num: int = 1,
    q_den: int = 4,
) -> DataFrame:
    """Rows at or above their group's q-th histogram bin: the adaptive
    per-group threshold pattern (FineWeb tunes quality cutoffs per
    LANGUAGE, not globally). Plan at scale: one narrow (group, bin)
    agg builds the sketch, the per-group threshold relation is
    group-cardinality-sized -> broadcast back, the filter itself is
    row-local codegen. No global sort, no per-group sort, corpus
    scanned twice with the second scan column-pruned."""
    bins = build_bins(df, value_col, group_cols)
    thr = crossing_bin(bins, q_num, q_den)
    return df.join(F.broadcast(thr), group_cols).where(
        F.floor(F.col(value_col) / F.lit(HIST_W)) >= F.col("thr_bin")
    )


def adaptive_cutoff_oracle_sql(
    items_sql: str,
    value_col: str,
    group_col: str,
    q_num: int = 1,
    q_den: int = 4,
) -> str:
    """DuckDB re-derivation of the same integer crossing rule."""
    return f"""
WITH items AS ({items_sql}),
bins AS (
  SELECT {group_col} AS grp,
         CAST(floor({value_col} / {HIST_W}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM items GROUP BY 1, 2
),
cumed AS (
  SELECT grp, bin, cnt,
         sum(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY grp) AS n
  FROM bins
),
thr AS (
  SELECT grp, min(bin) AS thr_bin FROM cumed
  WHERE {q_den} * cum >= {q_num} * n GROUP BY grp
)
SELECT i.* FROM items i
JOIN thr t ON i.{group_col} = t.grp
WHERE CAST(floor(i.{value_col} / {HIST_W}) AS BIGINT) >= t.thr_bin
""".strip()
