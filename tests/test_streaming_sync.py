"""Streaming dedup + foreachBatch incremental sync tests."""

from __future__ import annotations

from lms_erp_data_integration_spark.streaming.sync import (
    incremental_sync,
    streaming_dedup,
)
from lms_erp_data_integration_spark.streaming.windows import events_stream
from pyspark.sql import functions as F


def test_streaming_dedup_bounded_state(spark, sf_dir):
    stream = streaming_dedup(
        events_stream(spark, sf_dir), ["user_id", "event_type"], "10 minutes"
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT user_id, event_type, COUNT(*) c FROM dedup_out GROUP BY 1,2")
    # within any 10-minute horizon a (user, type) pair appears once;
    # across the 30-day file it reappears after watermark eviction
    assert got.count() > 0
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got.count() <= batch.select("user_id", "event_type").distinct().count() * 50


def test_incremental_sync_foreachbatch(spark, sf_dir, tmp_path):
    mirror = str(tmp_path / "enr_mirror")
    emitted: list[int] = []
    q = incremental_sync(
        spark,
        events_stream(spark, sf_dir),
        mirror,
        ["user_id", "event_type"],
        lambda adds, epoch: emitted.append(adds.count()),
    )
    q.processAllAvailable()
    q.stop()
    # every distinct key emitted exactly once across all epochs
    total = sum(emitted)
    distinct = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert total == distinct
    assert spark.read.parquet(mirror).count() == distinct
