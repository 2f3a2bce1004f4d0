"""As-of (temporal) join — an operator Spark lacks as a primitive.

Joins each fact row to the LATEST dimension row at-or-before its
timestamp per key (prices/rates/config-versions against an event
stream). Spark has no ASOF JOIN; the scale-safe formulation is the
tagged UNION + window fill:

  union(facts tagged 0, dim tagged 1)
    → window per key ordered by (ts, tag DESC)
    → last_value(dim value, ignorenulls) over rows unbounded preceding
    → keep fact rows

ONE shuffle on the join key, no range-explode, no per-fact probe —
versus the naive `fact JOIN dim ON key AND dim.ts <= fact.ts` +
row_number, which materializes every (fact, earlier-dim) pair
(quadratic in versions per key). Keys are the window partitions; a
hot key salts the same way sessionize does at cluster scale.

The DuckDB oracle uses the engine's NATIVE `ASOF JOIN` — a fully
independent second implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    facts_ts: str = "ts",
    dim_ts: str = "rate_ts",
    value_cols: tuple[str, ...] = ("rate",),
) -> DataFrame:
    """Left as-of join: facts + latest dim values with dim_ts <= ts.

    Dim rows sort AFTER fact rows only via tag ordering: at equal
    timestamps the dim row wins (ASOF's <= semantics) because the
    window orders by (ts, tag DESC) and dim carries tag 1.
    """
    f = facts.withColumn("__tag", F.lit(0)).withColumn(
        "__ts", F.col(facts_ts)
    )
    d = dim.select(
        F.col(key),
        F.col(dim_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in value_cols],
    )
    for c in facts.columns:
        if c not in d.columns:
            d = d.withColumn(c, F.lit(None))
    for c in value_cols:
        f = f.withColumn(c, F.lit(None).cast(d.schema[c].dataType))
    u = f.unionByName(d.select(*f.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__tag").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in facts.columns],
        "__tag",
        *[
            F.last(
                F.when(F.col("__tag") == 1, F.col(c)), ignorenulls=True
            ).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    out = filled.where(F.col("__tag") == 0).drop("__tag")
    for c in value_cols:
        out = out.drop(c).withColumnRenamed(f"__asof_{c}", c)
    return out


def asof_join_broadcast(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    facts_ts: str = "ts",
    dim_ts: str = "rate_ts",
    value_cols: tuple[str, ...] = ("rate",),
) -> DataFrame:
    """As-of via a broadcast version-array — the plan for SMALL dims.

    The union-window plan shuffles facts by the join key; with a
    low-cardinality key (10 rate symbols, say) that is a hot-partition
    hazard at 100 TB. When the dim fits a broadcast (the common case
    for rates/config tables), collapse it to ONE row per key holding
    the ts-sorted version array, broadcast-join it to facts (no
    shuffle of facts at all), and pick the latest at-or-before version
    with a row-local array filter — O(versions-per-key) per fact, all
    codegen.
    """
    varr = dim.groupBy(key).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(dim_ts).alias("ts"), *value_cols))
        ).alias("__versions")
    )
    out = facts.join(F.broadcast(varr), on=key, how="left")
    # try_element_at: under ANSI mode (Spark 4 default) element_at(-1)
    # on an EMPTY filtered array throws instead of returning NULL — a
    # fact before any version must yield NULL like the window plan
    pick = F.expr(
        f"try_element_at(filter(__versions, v -> v.ts <= {facts_ts}), -1)"
    )
    out = out.withColumn("__pick", pick).drop("__versions")
    for c in value_cols:
        out = out.withColumn(c, F.col(f"__pick.{c}"))
    return out.drop("__pick")
