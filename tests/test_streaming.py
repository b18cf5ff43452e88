"""Structured Streaming smoke tests (SURVEY.md M8): file-source stream
driven to completion via the memory sink, compared against batch twins."""

from __future__ import annotations

import pytest

from lms_erp_data_integration_spark.catalog import Catalog
from lms_erp_data_integration_spark.plans import QUERIES
from lms_erp_data_integration_spark.streaming import (
    hourly_event_counts,
    running_user_totals,
)
from lms_erp_data_integration_spark.streaming.windows import (
    events_stream,
    run_to_memory_sink,
    sliding_event_value,
)
from pyspark.sql import functions as F


def test_streaming_hourly_matches_batch(spark, sf_dir):
    stream = hourly_event_counts(events_stream(spark, sf_dir))
    got = run_to_memory_sink(stream, "hourly_out")
    batch = QUERIES["rel_events_hourly"](spark, sf_dir)
    s = {
        (r["hour"], r["event_type"]): (r["n"], r["total_value"])
        for r in got.collect()
    }
    b = {
        (r["hour"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    assert s == b  # streaming result == batch twin, bit-for-bit


def test_sliding_windows_overlap(spark, sf_dir):
    got = run_to_memory_sink(
        sliding_event_value(events_stream(spark, sf_dir)), "sliding_out"
    )
    n_events = Catalog(spark, sf_dir).events.count()
    # 1h window sliding by 15min: every event lands in exactly 4 windows
    assert got.agg(F.sum("n")).first()[0] == 4 * n_events


def test_stateful_running_totals(spark, sf_dir):
    stream = running_user_totals(events_stream(spark, sf_dir))
    got = run_to_memory_sink(stream, "state_out", mode="update")
    # last emission per user must equal the batch per-user totals
    latest = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        Catalog(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert {
        (r["user_id"], r["n_events"]) for r in latest.collect()
    } == {(r["user_id"], r["n_events"]) for r in batch.collect()}


def test_registered_streaming_queries_match_batch(spark, sf_dir):
    """The two registered streaming queries (the ones the driver
    hash-checks) produce exactly their batch-twin answers."""
    from lms_erp_data_integration_spark.plans.registry import QUERIES

    hourly = QUERIES["stream_events_hourly"](spark, sf_dir)
    batch = QUERIES["rel_events_hourly"](spark, sf_dir)
    key = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert key(hourly) == key(batch)

    totals = QUERIES["stream_stateful_user_totals"](spark, sf_dir)
    batch_totals = (
        Catalog(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "total_value_micros"
            ),
        )
    )
    assert key(totals) == key(batch_totals)
