"""Streaming variants of the sync/dedup operators (SURVEY.md M8 tail).

- ``streaming_dedup``: drop duplicate events within the watermark
  horizon (built-in state store; the streaming twin of exact dedup).
- ``incremental_sync``: the reference's *daily* full-snapshot diff
  (``DailyEnrollment.sql``) re-expressed as continuous increments: each
  micro-batch of change events is diffed against the persistent mirror
  with ``foreachBatch`` (exactly-once per epoch with a transactional
  sink), emitting adds immediately instead of once a day. State = the
  mirror Parquet table, not executor memory, so it survives restarts
  and scales with storage rather than RAM.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.diff import missing_rows


def streaming_dedup(
    events: DataFrame, key_cols: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once events by key within the watermark window —
    ``dropDuplicatesWithinWatermark`` keeps state bounded (keys older
    than the watermark are evicted), unlike an unbounded
    ``dropDuplicates`` whose state grows forever on a real stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def incremental_sync(
    spark: SparkSession,
    change_stream: DataFrame,
    mirror_path: str,
    key_cols: list[str],
    on_adds: Callable[[DataFrame, int], None],
) -> "object":
    """foreachBatch incremental sync: per micro-batch, anti-join the
    batch against the mirror, hand the adds to ``on_adds`` (the sink),
    and append them to the mirror so later batches see them."""

    def mirror_exists() -> bool:
        # Hadoop FS check (portable to HDFS/S3, unlike os.path); avoids
        # a catch-all around the read that would mask real failures
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(mirror_path)
        return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)

    def step(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.select(*key_cols).distinct()
        if mirror_exists():
            mirror = spark.read.parquet(mirror_path).select(*key_cols)
            adds = missing_rows(batch, mirror, key_cols)
        else:  # first epoch: mirror doesn't exist yet
            adds = batch
        adds = adds.persist()
        on_adds(adds, epoch_id)
        adds.write.mode("append").parquet(mirror_path)
        adds.unpersist()

    return (
        change_stream.writeStream.outputMode("update")
        .foreachBatch(step)
        .start()
    )
