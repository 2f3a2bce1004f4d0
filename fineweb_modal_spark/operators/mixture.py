"""Data-mixture sampling: per-source deterministic down-sampling.

Training corpora are MIXTURES: each source/domain gets a target weight
(DoReMi / The Pile / FineWeb recipe tables), and overrepresented
sources are down-sampled to hit it. The sampler must be deterministic
(rerun → same corpus, resumable shards), per-document (not
per-partition), and driven by a RATES TABLE, not code — recipes change
per experiment, the operator doesn't.

Implementation: the same stable md5 coin as split.py/stratified
sampling — keep iff md5('mix:' || id) % DEN < rate[source] — with the
rates relation joined in as a BROADCAST dimension (a real recipe table
is thousands of domains; never a shuffle of the corpus side). The
coin is independent of split.py's coin (different salt), so mixture
sampling composes with train/val/test sharding without correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spec import hashing as H

S = H.SPARK

MIX_DEN = 1000


def coin_expr(d: str, id_col: str = "doc_id") -> str:
    cast = "STRING" if d == S else "VARCHAR"
    h = H.md5_i64(f"'mix:' || CAST({id_col} AS {cast})", d)
    return f"({h}) % {MIX_DEN}"


def mixture_sample(
    docs: DataFrame,
    rates: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Keep each doc with probability rate_num/MIX_DEN of its source.

    `rates` is a (source, rate_num) relation — broadcast dimension.
    Sources absent from the rates table are DROPPED (inner join): an
    unlisted domain is not part of the recipe. Row-local coin, no
    corpus shuffle."""
    coined = docs.withColumn("__coin", F.expr(coin_expr(S, id_col)))
    return (
        coined.join(F.broadcast(rates), source_col)
        .where(F.col("__coin") < F.col("rate_num"))
        .drop("__coin", "rate_num")
    )
