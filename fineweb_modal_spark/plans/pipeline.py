"""The north-rule DAG: langid → quality-score → PII/toxicity scrub.

One logical plan over the pages table; Catalyst fuses the pure-column
stages (signals, keep, scrub) into the same whole-stage-codegen spans
around a SINGLE fused Arrow UDF stage (langid+perplexity,
operators/scoring.py). No shuffle anywhere in the per-document
path — the DAG is embarrassingly parallel, so 1000-executor scaling
is limited only by scan/write parallelism (partition count).

Reference analog: the chunk→filter→embed→summary scripts composed
end-to-end (SURVEY.md §3), minus the per-script volume round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import quality, scoring, scrub
from ..sources import pages as pages_mod


from ..functions.parallelism import ensure_parallelism as _ensure_parallelism  # noqa: E402


def pipeline_df(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, [html,] text, lang, ...) → scored + scrubbed."""
    df = scoring.with_scores(_ensure_parallelism(pages))
    df = quality.with_signals(df)
    df = quality.with_keep(df, lang_col="lang_pred")
    df = scrub.with_scrubbed(df)
    return df


def run_pipeline(spark: SparkSession, sf_dir: str, with_html: bool = False) -> DataFrame:
    return pipeline_df(pages_mod.load_pages(spark, sf_dir, with_html=with_html))


def pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship rollup: per predicted language, keep/drop counts and
    mean signals — the engine's analog of the reference's corpus-wide
    summary.py:69-84."""
    df = run_pipeline(spark, sf_dir)
    return (
        df.groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).alias("n_keep"),
            F.round(F.avg("ppl"), 4).alias("avg_ppl"),
            F.round(F.avg("n_words"), 4).alias("avg_words"),
            F.round(F.avg("lang_conf"), 4).alias("avg_conf"),
        )
        .orderBy("lang_pred")
    )
