"""Structured Streaming variants of the daily snapshot diff
(SURVEY.md M8) — the reference re-runs a full batch diff daily
(``DailyEnrollment.sql``, ``src/jenzabar.py:56``); the streaming form
processes increments with watermarked event-time windows instead.

The batch twin of ``hourly_event_counts`` is the registered
``rel_events_hourly`` query — the streaming aggregation produces the
same rows once the watermark closes each window (verified in tests via
the memory sink + ``processAllAvailable``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog, parquet_schema

# State-store partition count for streaming runs. Unlike batch shuffles
# (where AQE coalesces empty partitions away), every state partition
# costs a state-store task + checkpoint write PER MICRO-BATCH whether or
# not it holds keys — so the right number tracks the key cardinality /
# executor count, not the batch shuffle default. On a real cluster this
# would be sized to the executor fleet; for the bounded local runs a
# handful of fuller partitions beats 32 near-empty ones by ~10x.
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table. The nanos ts arrives
    as long (session conf) and is converted exactly like the batch
    Catalog path — one schema for both modes."""
    # same runtime conf Catalog sets: events ts is TIMESTAMP(NANOS),
    # readable only as long — required here too when the caller hands
    # us a vanilla session
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = parquet_schema(
        spark, f"{sf_dir.rstrip('/')}/events.parquet"
    )
    # file-stream sources take a directory; pathGlobFilter selects the
    # events table out of the shared sf dir
    raw = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    # Mirror the batch Catalog's ts normalization so batch and stream
    # share one schema: long nanos -> µs timestamp (old driver data),
    # TIMESTAMP_NTZ µs -> session-local timestamp (new driver data;
    # session TZ pinned to UTC so the cast is value-preserving).
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table — the continuous-
    ingest shape of a training-data pipeline (each arriving file is
    one micro-batch of new documents)."""
    batch_schema = parquet_schema(
        spark, f"{sf_dir.rstrip('/')}/documents.parquet"
    )
    return (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir.rstrip("/"))
    )


def embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the embeddings table — arriving vector
    batches for streaming index-maintenance rows."""
    batch_schema = parquet_schema(
        spark, f"{sf_dir.rstrip('/')}/embeddings.parquet"
    )
    return (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir.rstrip("/"))
    )


def hourly_event_counts(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling 1-hour window per event_type with late-data watermark.
    Streaming twin of ``rel_events_hourly``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )


def sliding_event_value(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Sliding windows (1 h, slide 15 min): each event lands in 4
    windows — overlap handled by the engine's window generator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, mode: str = "complete"
) -> DataFrame:
    """Drive a bounded file-source stream to completion synchronously
    (memory sink; local smoke-test harness, guide 'Structured
    Streaming').

    Default mode 'complete': with a bounded file source nothing ever
    advances the watermark past the last window, so append mode would
    hold the tail windows back forever; complete emits every window and
    lets tests compare 1:1 against the batch twin.

    ``spark.sql.shuffle.partitions`` is scoped to
    ``STREAM_STATE_PARTITIONS`` for the duration of the run: a streaming
    query pins its state-store partition count from this conf at first
    start, and each state partition costs a checkpoint task per
    micro-batch even when empty — the batch default (32 here) is sized
    for shuffle width, not state width. Restored afterwards so batch
    plans in the same session are unaffected."""
    spark = stream_df.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
    )
    try:
        q = (
            stream_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def session_event_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_user: int = 10,
) -> DataFrame:
    """Streaming session windows (gap-merged, per user) — the streaming
    twin of ``rel_session_window_native``. Session windows only run in
    append/update mode, so on a bounded source the final watermark
    (max event time - delay) withholds any still-open tail sessions;
    the oracle applies the same cutoff."""
    return (
        events.where(F.col("user_id") <= max_user)
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def attribution_join(
    events: DataFrame,
    max_delay: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the
    view events it follows within ``max_delay`` for the same user.
    Both sides carry watermarks and the join has a time-range bound,
    so the state store evicts views older than the delay — bounded
    state at any stream length. Inner joins emit on match, so a
    bounded source yields exactly the batch join's rows."""
    v = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return v.join(
        p,
        F.expr(
            f"""v_user = user_id
            AND purchase_ts > view_ts
            AND purchase_ts <= view_ts + interval {max_delay}"""
        ),
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")


def windowed_value_histogram(
    events: DataFrame,
    watermark: str = "1 hour",
    bucket_width: float = 50.0,
    buckets: int = 10,
) -> DataFrame:
    """Fixed-bounds value histogram per tumbling hour — distribution
    monitoring IN FLIGHT (drift shows up as mass shifting between
    buckets window over window, hours before an aggregate average
    moves). Bounds are fixed, not data-derived: streaming state must
    not depend on global min/max, which a stream never has; the
    equi-width data-derived form is the batch
    ``profiling.equi_width_histogram``.

    State: (windows x buckets) rows — constant per window, no
    per-key growth."""
    bucket = F.least(
        F.lit(buckets - 1),
        F.floor(F.col("value") / F.lit(bucket_width)).cast("int"),
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), bucket.alias("bucket_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour"), "bucket_id", "n")
    )
