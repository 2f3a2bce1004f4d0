"""Incremental/streaming execution: Structured Streaming runtime.

The reference is batch-only; its incremental story is idempotent
per-shard reruns (SURVEY.md §2.9). The Spark engine adds the real
thing:

* `run_pipeline_incremental` — `readStream` over a pages directory +
  the SAME stateless pipeline DAG (plans/pipeline.py) + `writeStream`
  parquet with `Trigger.AvailableNow` and a checkpoint: each
  invocation processes exactly the files that arrived since the last
  checkpoint commit — exactly-once incremental filtering of a growing
  crawl, no manifest bookkeeping needed (the checkpoint's file log IS
  the manifest).
* `hourly_event_counts` — watermarked event-time windowed aggregation
  over an events stream (late data beyond 1 hour dropped), the
  canonical streaming agg.

Both run on AvailableNow so batch tests and cron-style incremental
jobs share one code path; a `processingTime` trigger turns the same
plan into a live stream untouched.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import pipeline as pl


def _events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    schema = spark.read.parquet(events_dir).schema  # schema from footer
    # fixture ts is TIMESTAMP_NTZ; watermarks require TIMESTAMP (LTZ) —
    # gate dispatch pins the session TZ to UTC (plans/queries.py
    # _tz_pinned) so the cast is value-preserving in any environment
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def hourly_event_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint: str,
    query_name: str = "hourly_counts",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Watermarked hourly windowed counts, materialized to a memory
    sink via AvailableNow; returns the result as a batch DataFrame.

    `watermark` is the late-data horizon. Gate callers pass a horizon
    LONGER than the fixture's event-time span: AvailableNow may
    legally split the input into several micro-batches in file-list
    order, and any row older than (max ts seen − horizon) would be
    silently dropped — the result must equal the batch oracle under
    EVERY legal batch split, not just the single-batch one.
    `max_files_per_trigger` lets tests force that multi-batch split."""
    ev = _events_stream(spark, events_dir, max_files_per_trigger)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value"
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def run_pipeline_incremental(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint: str
) -> int:
    """One AvailableNow increment of the full langid→quality→scrub DAG
    over whatever pages parquet files are new since the checkpoint.
    Returns the number of rows appended this increment."""
    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    result = pl.pipeline_df(stream).select(
        "url", "warc_ts", "doc_id", "lang_pred", "lang_conf", "ppl",
        "keep", "drop_reason", "scrubbed_text",
    )
    q = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    return int(progress["numInputRows"]) if progress else 0


def incremental_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def dedup_stream(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint: str
) -> int:
    """Streaming exact-dedup on url with a 1-day event-time watermark:
    re-crawled duplicates arriving within the watermark are dropped
    exactly-once across micro-batches (state = seen keys inside the
    watermark window — bounded, unlike an unwatermarked distinct).
    Returns rows written this increment."""
    schema = spark.read.parquet(pages_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(pages_dir)
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    )
    deduped = stream.withWatermark("warc_ts", "1 day").dropDuplicates(
        ["url", "warc_ts"]
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    return int(progress["numInputRows"]) if progress else 0


def attribution_join_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint: str,
    query_name: str = "attrib_join",
    trigger_type: str = "view",
    target_type: str = "purchase",
    horizon_minutes: int = 30,
    max_files_per_trigger: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join — the one Structured
    Streaming join class the rest of the module doesn't exercise
    (everything else is stream-static or single-stream stateful).

    Attribution semantics: every `target_type` event joins to each of
    the same user's `trigger_type` events that happened within
    `horizon_minutes` BEFORE it — a crawl pipeline uses the identical
    shape to pair fetch-results with their frontier-dispatch events.

    Both sides carry an event-time watermark and the join predicate
    carries a two-sided time bound, so each side's buffered state is
    evicted once the opposite watermark passes the horizon — bounded
    state regardless of stream length, the production requirement.
    Inner-join matches are emitted as found (the watermark only
    gates eviction, not emission), so a single-batch AvailableNow run
    equals the batch join exactly — which is what the gate's DuckDB
    oracle checks; `max_files_per_trigger` forces multi-batch runs so
    tests can prove matches survive ACROSS micro-batches on buffered
    state. Scale shape: one state-store exchange per side on user_id,
    no other shuffle."""
    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(events_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    views = (
        ev.where(F.col("event_type") == trigger_type)
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    buys = (
        ev.where(F.col("event_type") == target_type)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = (
        views.join(
            buys,
            F.expr(
                "user_id = p_user_id AND "
                "purchase_ts >= view_ts AND "
                f"purchase_ts <= view_ts + interval {int(horizon_minutes)} minutes"
            ),
            # "left_outer": views with NO target inside the horizon are
            # ALSO emitted (null target columns) — but only once the
            # joint watermark passes view_ts + horizon and evicts the
            # view from join state, since until then a match could
            # still arrive. That eviction-timed emission is exactly
            # what the unconverted-views gate's oracle re-derives.
            how,
        )
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            (
                F.col("purchase_ts").cast("long")
                - F.col("view_ts").cast("long")
            ).alias("lag_s"),
            F.round("purchase_value", 6).alias("purchase_value"),
        )
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def weekly_distinct_sketch(
    spark: SparkSession,
    events_dir: str,
    checkpoint: str,
    query_name: str = "weekly_hll",
    watermark: str = "1 day",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming HLL: distinct event_id per 7-day event-time window.

    The register build (`max(rho)` per (window, bucket)) IS the
    streaming-native distinct count: state is ≤ m integers per open
    window — bounded regardless of key cardinality — and late rows
    inside the watermark fold in through the same max. Contrast
    `dropDuplicates`, whose state grows with the number of distinct
    keys. The stream maintains REGISTERS only; the estimate is a
    cheap batch read-off of the memory sink (streaming allows a
    single aggregation per query, and the register agg is the one
    that needs the state machinery).

    `watermark`/`max_files_per_trigger` follow the hourly_event_counts
    contract: gates pass a horizon wider than the fixture span so the
    result is batch-split-invariant; tests force multi-batch runs.
    """
    from ..functions import sqldialect as sd
    from ..operators import hll

    ev = _events_stream(spark, events_dir, max_files_per_trigger)
    bucket, rho = hll.register_fragments("event_id", sd.SPARK)
    regs = (
        ev.withWatermark("ts", watermark)
        .selectExpr(
            "ts",
            f"CAST({bucket} AS INT) AS bucket",
            f"CAST({rho} AS INT) AS rho",
        )
        .groupBy(F.window("ts", "7 days").alias("w"), "bucket")
        .agg(F.max("rho").alias("m_j"))
        .select(
            F.col("w.start").cast("date").alias("week"), "bucket", "m_j"
        )
    )
    q = (
        regs.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return hll.estimate(spark.table(query_name))


def windowed_token_histogram(
    spark: SparkSession,
    pages_dir: str,
    checkpoint: str,
    query_name: str = "token_hist",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming per-window unigram histogram over a live crawl:
    readStream → explode tokens → watermarked 5-minute windowed count
    → memory sink. This is the monitoring feed `token_drift` consumes
    between windows — maintained incrementally instead of re-scanning
    the corpus per report. State is (open windows × vocab) counters,
    bounded by the watermark; late pages inside it fold into the same
    count."""
    from ..functions import sqldialect as sd
    from ..spec import hashing as H

    schema = spark.read.parquet(pages_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(pages_dir).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp")
    )
    toks = H.tokens_lower("text", sd.SPARK)
    hist = (
        stream.withWatermark("warc_ts", watermark)
        .select("warc_ts", F.explode(F.expr(toks)).alias("token"))
        .where(F.col("token") != "")
        .groupBy(F.window("warc_ts", "5 minutes").alias("w"), "token")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .select(F.col("w.start").alias("win_start"), "token", "n_tokens")
    )
    q = (
        hist.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def lm_score_stream(
    spark: SparkSession,
    docs_dir: str,
    checkpoint: str,
    query_name: str = "lm_scores",
) -> DataFrame:
    """Train-batch / score-stream: the bigram LM is frozen from the
    BATCH view of docs_dir, then a readStream over the same directory
    scores arriving docs against it — stateless row-local bigram
    explode + stream-static broadcast joins, then a per-doc rollup in
    complete mode to the memory sink. This is the production shape for
    model-based filters on a live crawl: the model is an artifact of
    the last training run, never recomputed per micro-batch. (A real
    deployment would window the rollup by arrival time to bound state;
    the gate's AvailableNow single batch makes complete mode exact.)"""
    from ..operators import ngramlm

    batch = spark.read.parquet(docs_dir)
    model, uni, n_total = ngramlm.train_model(batch)
    stream = spark.readStream.schema(batch.schema).parquet(docs_dir)
    scored = ngramlm.score_against_model(stream, model, uni, n_total)
    q = (
        scored.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def dsir_score_stream(
    spark: SparkSession,
    docs_dir: str,
    checkpoint: str,
    query_name: str = "dsir_scores",
) -> DataFrame:
    """Train-batch / score-stream for the DSIR reweighting stage: the
    bucket log-ratio index is frozen from the BATCH view of docs_dir
    (≤256-row collect), then a readStream over the same directory
    scores arriving documents via the constant-folded map-literal fold
    — the per-doc sum runs INSIDE each row, so the scorer is
    stateless (zero shuffle, zero stream state, append mode). Same
    production shape as edu_score_stream/lm_score_stream: index is an
    artifact of the last training run, never recomputed per
    micro-batch."""
    from ..operators import reweight

    batch = spark.read.parquet(docs_dir)
    ratio_rows = reweight.train_dsir_ratio(batch).collect()
    stream = spark.readStream.schema(batch.schema).parquet(docs_dir)
    tok_count, lw = reweight.dsir_literal_score_exprs(ratio_rows)
    scored = stream.select(
        "doc_id", tok_count.alias("tok_count"), lw.alias("lw_micro")
    )
    q = (
        scored.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def edu_score_stream(
    spark: SparkSession,
    emb_dir: str,
    checkpoint: str,
    query_name: str = "edu_scores",
) -> DataFrame:
    """Train-batch / score-stream for the SEMANTIC admission stage:
    the seed centroid is frozen from the BATCH view of emb_dir, then a
    readStream over the same directory scores arriving vectors against
    it. Scoring is a stateless row-local literal fold (zero shuffle,
    zero stream state) — append mode, no watermark needed; the
    centroid is an artifact of the last training run, never recomputed
    per micro-batch. Same production shape as lm_score_stream."""
    from ..operators import similarity

    batch = spark.read.parquet(emb_dir)
    cent = similarity.train_edu_centroid(batch)
    stream = spark.readStream.schema(batch.schema).parquet(emb_dir)
    scored = similarity.edu_scores(stream, cent)
    q = (
        scored.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def scrub_stats_stream(
    spark: SparkSession,
    pages_dir: str,
    checkpoint: str,
    query_name: str = "scrub_stats",
) -> DataFrame:
    """Live scrub-metrics dashboard: the per-host PII/toxicity hit
    counts computed over a pages STREAM — stateless codegen scrub
    projection per row, complete-mode grouped counts (state bounded by
    the host cardinality, never the corpus). Single-batch AvailableNow
    ⇒ hash-equals the batch scrub_stats oracle."""
    from ..operators import scrub

    batch = spark.read.parquet(pages_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(pages_dir)
        .withColumn(
            "host", F.regexp_extract("url", r"https://([^./]+)", 1)
        )
    )
    agg = scrub.scrub_stats(stream, by="host")
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_commit_pages(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint: str,
    granularity: str = "minute",
    max_files_per_trigger: int | None = None,
    publish_hook=None,
) -> int:
    """Streaming ingest through the SAME committed ds=... layout as the
    batch sink (sinks.write_partition) — foreachBatch + the batchId
    idempotence contract, so a crash at ANY point replays to the
    identical on-disk state:

    1. STAGE  — the micro-batch runs the full pipeline DAG, gets
       ds/salt partition columns, and is written per-ds under
       out_dir/_stream_stage/batch=N (mode=overwrite: a replayed batch
       rebuilds its stage from scratch).
    2. PUBLISH — the driver moves each staged file to
       ds=X/stream-b{N:06d}-{i:04d}.parquet. Names are DETERMINISTIC
       per (batch, position), and any stream-b{N}-* leftovers of a
       torn earlier attempt are deleted first, so replay converges on
       the identical file set — no duplicates, no partials.
    3. MANIFEST — one op='stream_append' lineage row per (ds, batch)
       with the same n_rows/n_keep/out_chars metrics the batch sink
       observes; skipped if that (ds, batch) row already exists
       (crash landed between manifest append and checkpoint advance).

    The published layout is file-identical in shape to the batch
    sink's, so read_output / compact_partition / vacuum_manifest work
    unchanged over mixed batch+stream partitions. Scale: the per-batch
    driver loop touches file NAMES and a collected per-ds metrics row
    set (both ds-count-sized); row data moves via os.replace only.

    `publish_hook(phase, epoch_id)` is a test crash-injection point
    (phase in {'staged', 'published'}). Returns total rows committed
    by THIS run (sum of manifest rows it appended)."""
    import glob
    import os
    import shutil

    from .. import sinks

    total = {"n": 0}
    schema = spark.read.parquet(pages_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(pages_dir)

    def _publish(bdf: DataFrame, epoch_id: int) -> None:
        part = sinks.with_partition_cols(
            pl.pipeline_df(bdf), granularity=granularity
        ).select(
            "url", "ds", "salt", "doc_id", "lang_pred", "ppl",
            "keep", "drop_reason", "scrubbed_text",
        )
        stage = os.path.join(out_dir, "_stream_stage", f"batch={epoch_id}")
        metrics = {
            str(r["ds"]): r
            for r in part.groupBy("ds").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("keep").cast("long")).alias("n_keep"),
                F.sum(F.length("scrubbed_text").cast("long")).alias(
                    "out_chars"
                ),
            ).collect()
        }
        for ds in sorted(metrics):
            part.where(F.col("ds") == F.lit(ds)).repartition(
                F.col("salt")
            ).write.mode("overwrite").parquet(os.path.join(stage, f"ds={ds}"))
        if publish_hook:
            publish_hook("staged", epoch_id)
        for ds in sorted(metrics):
            tgt = os.path.join(out_dir, f"ds={ds}")
            os.makedirs(tgt, exist_ok=True)
            for old in glob.glob(
                os.path.join(tgt, f"stream-b{int(epoch_id):06d}-*.parquet")
            ):
                os.remove(old)
            staged = sorted(
                f
                for f in os.listdir(os.path.join(stage, f"ds={ds}"))
                if f.endswith(".parquet") and not f.startswith("_")
            )
            for i, f in enumerate(staged):
                os.replace(
                    os.path.join(stage, f"ds={ds}", f),
                    os.path.join(
                        tgt, f"stream-b{int(epoch_id):06d}-{i:04d}.parquet"
                    ),
                )
        if publish_hook:
            publish_hook("published", epoch_id)
        already: set[tuple[str, int]] = set()
        try:
            # mergeSchema: on a mixed batch+stream table the manifest
            # holds differently-shaped rows (batch-sink rows lack
            # batch_id); plain schema inference could sample a
            # batch-row file, drop the column, and silently disable
            # the replay-dedup guard — a crash-replay would then
            # double-append manifest rows and double-count totals.
            man = spark.read.option("mergeSchema", "true").parquet(
                os.path.join(out_dir, sinks.MANIFEST_DIR)
            )
            if "batch_id" in man.columns:
                already = {
                    (str(r.ds), int(r.batch_id))
                    for r in man.where(
                        F.col("batch_id").isNotNull()
                    ).select("ds", "batch_id").collect()
                }
        except AnalysisException as e:
            # only the first-commit case (no manifest dir yet) is
            # benign; any other read failure must not silently turn
            # off idempotence
            if "PATH_NOT_FOUND" not in str(e):
                raise
        import time as _time

        for ds in sorted(metrics):
            if (ds, int(epoch_id)) in already:
                continue
            m = metrics[ds]
            sinks._write_manifest_row(
                spark,
                out_dir,
                {
                    "ds": ds,
                    "sink": "parquet",
                    "op": "stream_append",
                    "batch_id": int(epoch_id),
                    "n_rows": int(m["n_rows"]),
                    "n_keep": int(m["n_keep"] or 0),
                    "out_chars": int(m["out_chars"] or 0),
                    "committed_at": _time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", _time.gmtime()
                    ),
                    "commit_seq": _time.time_ns(),
                },
            )
            total["n"] += int(m["n_rows"])
        if publish_hook:
            # crash-injection point for the replay-dedup window:
            # manifest rows appended, checkpoint NOT yet advanced
            publish_hook("manifested", epoch_id)
        shutil.rmtree(stage, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(_publish)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return total["n"]


def pack_layout_stream(
    spark: SparkSession,
    docs_dir: str,
    checkpoint: str,
    query_name: str = "pack_layout",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The sequence packer IN THE INGEST STREAM: per-source running
    token offsets are kept as stream state (one BIGINT per source —
    the same |sources|-row relation `seqpack.source_totals` persists
    for the batch-incremental path), and every arriving document is
    emitted with its packed coordinates in append mode.

    Semantics: packing order is arrival order, micro-batch by
    micro-batch, sorted by doc_id within each (source, batch) group —
    under AvailableNow each source's whole fixture arrives in one
    group, so the emission is exactly the batch
    `seqpack.sequence_layout` relation (the gate's oracle), and under
    forced multi-batch execution the offsets continue across batches
    (state continuation is pytest-proven equal to the batch layout
    when files partition doc_id ranges in order). State is
    O(|sources|), shuffle key is `source` — identical partitioning to
    the batch window path, so the operator survives a 10^12-doc
    stream."""
    from collections.abc import Iterator as _Iterator

    import pandas as _pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from ..operators import seqpack as _seqpack

    seq_len = _seqpack.SEQ_LEN

    out_schema = (
        "doc_id bigint, source string, tok_count bigint, "
        "start_tok bigint, seq_first bigint, seq_last bigint, "
        "n_seqs bigint, offset_in_seq bigint"
    )

    def _pack_fn(
        key: tuple, pdfs: _Iterator[_pd.DataFrame], state: GroupState
    ) -> _Iterator[_pd.DataFrame]:
        (source,) = key
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = _pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        base = state.get[0] if state.exists else 0
        tok = (pdf["n_chars"].astype("int64") // 4 + 2).astype("int64")
        start = base + tok.cumsum() - tok
        end = start + tok - 1
        state.update((int(base + int(tok.sum())),))
        yield _pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "source": source,
                "tok_count": tok,
                "start_tok": start,
                "seq_first": start // seq_len,
                "seq_last": end // seq_len,
                "n_seqs": end // seq_len - start // seq_len + 1,
                "offset_in_seq": start % seq_len,
            }
        )

    batch_schema = spark.read.parquet(docs_dir).schema
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger is not None:
        # test hook: force multi-batch execution (files process in
        # modification-time order) to prove state continuation
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir).select("doc_id", "source", "n_chars")
    packed = stream.groupBy("source").applyInPandasWithState(
        _pack_fn,
        out_schema,
        "tokens_so_far bigint",
        "append",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        packed.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
