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


# ---------------------------------------------------------------------------
# Epoch UPSAMPLING: mixture rates above 1 (DoReMi/llama-style
# upweighting of high-quality sources)
# ---------------------------------------------------------------------------


def upsample(
    docs: DataFrame,
    rates: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Replicate each doc rate/MIX_DEN times in expectation:
    floor(rate/DEN) whole copies per doc plus one extra with
    probability (rate % DEN)/DEN via the deterministic md5 coin —
    e.g. rate_num=2500 → 2.5 epochs of that source. Output rows carry
    copy_id (0-based) so downstream shuffles can salt on it.

    Zero-shuffle row-local explode after the broadcast rates join; the
    expansion factor is the recipe's, so output size is budgeted by
    construction. The fractional coin shares mixture_sample's salt —
    rate_num <= DEN degenerates to exactly mixture_sample's keep set
    (copy 0 iff coin < rate), so down- and up-sampling are ONE
    consistent policy."""
    coined = docs.withColumn("__coin", F.expr(coin_expr(S, id_col)))
    n_copies = (
        F.floor(F.col("rate_num") / F.lit(MIX_DEN))
        + (F.col("__coin") < F.col("rate_num") % F.lit(MIX_DEN)).cast("bigint")
    )
    return (
        coined.join(F.broadcast(rates), source_col)
        .withColumn("__n", n_copies)
        .where(F.col("__n") > 0)
        .withColumn("copy_id", F.explode(F.expr("sequence(0, __n - 1)")))
        .drop("__coin", "rate_num", "__n")
    )


def upsample_rates_sql(d: str) -> str:
    """Deterministic recipe: wiki-ish source upweighted 2.5x, web 0.4x,
    one source absent (dropped)."""
    return (
        "SELECT * FROM (VALUES "
        "('src0', 2500), ('src1', 400), ('src2', 1000), ('src3', 1700)"
        ") AS t(source, rate_num)"
    )


def upsample_oracle_sql(d: str, table: str = "documents") -> str:
    coin = coin_expr(d)
    seq = (
        "sequence(0, CAST(n_copies - 1 AS INT))"
        if d == S
        else "generate_series(0, CAST(n_copies - 1 AS BIGINT))"
    )
    return f"""
WITH rates AS ({upsample_rates_sql(d)}),
coined AS (
  SELECT d.doc_id, d.source, ({coin}) AS coin, r.rate_num
  FROM {table} d JOIN rates r ON d.source = r.source
),
expanded AS (
  SELECT doc_id, source,
         (rate_num // {MIX_DEN})
           + CASE WHEN coin < rate_num % {MIX_DEN} THEN 1 ELSE 0 END AS n_copies
  FROM coined
)
SELECT doc_id, source, CAST(unnest({seq}) AS BIGINT) AS copy_id
FROM expanded WHERE n_copies > 0
""".strip()


# ---------------------------------------------------------------------------
# Temperature sampling: multilingual rebalancing (XLM-R / mC4 alpha)
# ---------------------------------------------------------------------------

# p_l^alpha renormalization (Conneau et al. 2020, arXiv:1911.02116).
# The per-language keep rate reduces to r_l = (n_l / n_min)^(alpha-1):
# the corpus total cancels, the RAREST language keeps 100%, and every
# higher-resource language is down-sampled toward the temperature
# share. alpha=1 is proportional (no-op); alpha->0 is uniform.
TEMP_ALPHA = 0.3


def temp_coin_expr(d: str, id_col: str = "doc_id") -> str:
    """Distinct salt so temperature sampling composes with
    mixture_sample ('mix:') and split.py sharding without
    correlation."""
    cast = "STRING" if d == S else "VARCHAR"
    h = H.md5_i64(f"'temp:' || CAST({id_col} AS {cast})", d)
    return f"({h}) % {MIX_DEN}"


def temperature_rates(
    docs: DataFrame, alpha: float = TEMP_ALPHA, lang_col: str = "lang"
) -> DataFrame:
    """(lang, n_docs, rate_num): integer per-mille keep rates from
    the temperature rule. One partial-agg shuffle over ≤|langs|
    groups; n_min via an unpartitioned window over the LANG relation
    (|langs| rows — never the corpus)."""
    from pyspark.sql import Window

    counts = docs.groupBy(lang_col).agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()
    return counts.withColumn(
        "rate_num",
        F.round(
            F.lit(MIX_DEN)
            * F.pow(
                F.col("n_docs") / F.min("n_docs").over(w),
                F.lit(alpha - 1.0),
            )
        ).cast("int"),
    )


def temperature_sample(
    docs: DataFrame,
    alpha: float = TEMP_ALPHA,
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Down-sample each language to its temperature share with the
    deterministic md5 coin — broadcast rates join, row-local coin,
    zero corpus shuffle beyond the tiny counts agg."""
    rates = temperature_rates(docs, alpha=alpha, lang_col=lang_col)
    coined = docs.withColumn("__coin", F.expr(temp_coin_expr(S, id_col)))
    return (
        coined.join(
            F.broadcast(rates.select(lang_col, "rate_num")), lang_col
        )
        .where(F.col("__coin") < F.col("rate_num"))
        .drop("__coin", "rate_num")
    )


def temperature_report(
    docs: DataFrame, alpha: float = TEMP_ALPHA, lang_col: str = "lang"
) -> DataFrame:
    """Gate frame: (lang, n_docs, rate_num, n_kept) — the rebalancing
    audit row a curator reads before committing an alpha."""
    rates = temperature_rates(docs, alpha=alpha, lang_col=lang_col)
    kept = (
        temperature_sample(docs, alpha=alpha, lang_col=lang_col)
        .groupBy(lang_col)
        .agg(F.count("*").alias("n_kept"))
    )
    return rates.join(kept, lang_col, "left").select(
        lang_col,
        "n_docs",
        "rate_num",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def temperature_oracle_sql(
    d: str,
    alpha: float = TEMP_ALPHA,
    table: str = "documents",
    lang_col: str = "lang",
) -> str:
    coin = temp_coin_expr(d)
    return f"""
WITH counts AS (
  SELECT {lang_col} AS lang, count(*) AS n_docs FROM {table} GROUP BY {lang_col}
),
rates AS (
  SELECT lang, n_docs,
         CAST(round({MIX_DEN} * power(
           CAST(n_docs AS DOUBLE) / MIN(n_docs) OVER (), {alpha} - 1.0
         )) AS INT) AS rate_num
  FROM counts
),
kept AS (
  SELECT d.{lang_col} AS lang, count(*) AS n_kept
  FROM {table} d JOIN rates r ON d.{lang_col} = r.lang
  WHERE ({coin}) < r.rate_num
  GROUP BY d.{lang_col}
)
SELECT r.lang AS lang, r.n_docs, r.rate_num,
       COALESCE(k.n_kept, 0) AS n_kept
FROM rates r LEFT JOIN kept k ON r.lang = k.lang
""".strip()
