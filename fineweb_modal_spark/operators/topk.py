"""Per-feature top-K — the reference's two-script map/reduce as ONE query.

/root/reference/top10map.py (per-shard partial top-5 via argpartition,
feature space sharded over 4 processes) + top10reduce.py (global
concat, sort, groupby head) collapse into a single window query:
posexplode the per-row arrays, rank within each feature, keep K
(SURVEY.md §3.3). Catalyst executes it as partial sort + shuffle on
`feature` — the same map/reduce split, chosen automatically, and the
hydration join-back (top10reduce.py:26-39) is a broadcast hash join
because the winners side is tiny (≤ K × n_features rows).

Deterministic tie-break on the row key so results are reproducible
(reference relies on stable input order instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_feature(
    emb: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows per array position ('feature') by activation value.

    Output: feature:int, vec_id, activation:double, rank:int.
    """
    exploded = emb.select(
        F.col(key_col),
        F.posexplode(F.col(vec_col)).alias("feature", "activation"),
    ).withColumn("activation", F.col("activation").cast("double"))
    w = Window.partitionBy("feature").orderBy(
        F.desc("activation"), F.asc(key_col)
    )
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_sparse_per_feature(
    feats: DataFrame,
    k: int = 10,
    indices_col: str = "top_indices",
    acts_col: str = "top_acts",
    key_cols: tuple[str, ...] = ("shard", "pos"),
) -> DataFrame:
    """The exact reference shape: sparse (top_indices, top_acts) arrays
    (features.py:150-152) → global top-k per feature id.

    arrays_zip + posexplode is the Spark-native form of the numpy mask
    loop in top10map.py:49-58.
    """
    zipped = feats.select(
        *[F.col(c) for c in key_cols],
        F.explode(F.arrays_zip(indices_col, acts_col)).alias("z"),
    ).select(
        *[F.col(c) for c in key_cols],
        F.col(f"z.{indices_col}").cast("long").alias("feature"),
        F.col(f"z.{acts_col}").cast("double").alias("activation"),
    )
    w = Window.partitionBy("feature").orderBy(
        F.desc("activation"), *[F.asc(c) for c in key_cols]
    )
    return (
        zipped.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
