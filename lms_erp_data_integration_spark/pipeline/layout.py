"""Storage-layout management (100 TB posture, SURVEY.md section 4).

The reference's only layout decision is truncate-and-reload of four
mirror tables. At scale, layout IS performance: partition columns drive
pruning, file sizes drive scan parallelism, and bucketing pre-shuffles
recurring join keys. This module makes those choices explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024  # match files.maxPartitionBytes


def write_layout(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    approx_row_bytes: int | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> None:
    """Write Parquet with explicit layout: optional hive partitioning
    plus per-partition file sizing (repartition so output files land
    near ``target_file_bytes`` instead of one tiny file per task —
    the small-files problem is the classic 100 TB failure mode)."""
    if approx_row_bytes:
        n = df.count()
        files = max(1, (n * approx_row_bytes) // target_file_bytes)
        df = (
            df.repartition(int(files), *partition_cols)
            if partition_cols
            else df.repartition(int(files))
        )
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def bucketed_table(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    bucket_col: str,
    n_buckets: int = 32,
) -> None:
    """Persist as a bucketed managed table: joins/aggregations on
    ``bucket_col`` against other tables bucketed the same way need NO
    shuffle (co-located partitioning survives across queries, unlike a
    transient repartition)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )


def prune_report(spark: SparkSession, path: str, predicate: str) -> dict:
    """How much a partition predicate prunes: (files read with
    predicate) vs (total files) — the observable effect of a good
    partition layout."""
    df = spark.read.parquet(path)
    total = len(df.inputFiles())
    # inputFiles() ignores pruning; count the files actually READ
    read = (
        df.where(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    return {"total_files": total, "read_files": read}
