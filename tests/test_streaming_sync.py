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


def test_stream_checkpoint_restart_recovers_state(spark, sf_dir, tmp_path):
    """Exactly-once across restart: aggregate two slices of events,
    stop, land a third slice, restart from the SAME checkpoint — the
    restarted query must process only the new file (offset log) and
    its complete-mode output must equal the batch aggregate over all
    three slices (state store recovery), not double-count the old ones."""
    from lms_erp_data_integration_spark.catalog import Catalog

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    ev = Catalog(spark, sf_dir).events.select("event_id", "event_type")
    for sl in (0, 1):
        ev.where(F.col("event_id") % 3 == sl).repartition(1).write.mode(
            "append"
        ).parquet(src)

    def start(name):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start("ckpt_run1")
    q1.awaitTermination(120)
    two_slices = {
        r["event_type"]: r["n"] for r in spark.sql(
            "SELECT * FROM ckpt_run1"
        ).collect()
    }

    ev.where(F.col("event_id") % 3 == 2).repartition(1).write.mode(
        "append"
    ).parquet(src)
    q2 = start("ckpt_run2")
    q2.awaitTermination(120)
    got = {
        r["event_type"]: r["n"] for r in spark.sql(
            "SELECT * FROM ckpt_run2"
        ).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got == want
    # and the first run really did hold only the two-slice state
    part = {
        r["event_type"]: r["n"]
        for r in ev.where(F.col("event_id") % 3 != 2)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert two_slices == part
