"""Typed table catalog over the driver's Parquet test data.

The reference keeps its catalog implicitly: four Canvas mirror tables in
SQL Server (``src/jenzabar.py:35-36``) plus ERP tables addressed by the
seven diff queries. Here the catalog is explicit: named Parquet tables
registered as temp views, so every operator runs as a declarative
Catalyst plan over them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Schema cache for the immutable test-data tables (r14 optimization,
# guide §6/§5): ``spark.read.parquet(path)`` re-infers the schema on
# EVERY call — in Spark 4 that is a footer-reading pass (scheduled as
# a job) costing ~100-400 ms per table per query on this host, pure
# driver/scheduler overhead repeated by all ~223 registered queries.
# A real deployment reads table schemas from a metastore / table-format
# manifest exactly once; this cache is that, in-process. Keyed by the
# resolved path PLUS the file's (mtime_ns, size) so a rewritten
# fixture (tests build their own sf dirs) can never serve a stale
# schema; only table METADATA is cached — every query still computes
# its data from the parquet bytes.
_SCHEMA_CACHE: dict[tuple[str, int, int], StructType] = {}


def parquet_schema(spark: SparkSession, path: str) -> StructType:
    """Inferred schema of a parquet file/dir, cached on (path, mtime,
    size). Shared by the batch catalog and the file-stream sources so
    both modes skip per-query re-inference."""
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        # non-local path (e.g. an hdfs:// URI in a future deployment):
        # fall through to plain inference, uncached
        return spark.read.parquet(path).schema
    hit = _SCHEMA_CACHE.get(key)
    if hit is None:
        hit = _SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return hit


def _base_table(spark: SparkSession, path: str, name: str) -> DataFrame:
    """The base (unresolved, lazy) DataFrame for one table path, cached
    PER SESSION on the same (path, mtime_ns, size) key as the schema
    cache. ``spark.read.schema(s).parquet(path)`` still costs a
    measured ~35-80 ms per call (relation construction: py4j round
    trips + file listing + DataSource resolution) even with the schema
    cache — paid once per table per query by every registered query.
    A logical plan is immutable, so handing every query the SAME lazy
    frame is plan-metadata reuse, never result caching: each action
    still scans the parquet bytes. The cache hangs off the session
    object itself (dies with it; a restarted session can never serve
    frames bound to a stopped context), and the stat-key invalidates
    on rewrite exactly like the schema cache."""
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = None
    cache = getattr(spark, "_lms_table_cache", None)
    if cache is None:
        cache = {}
        spark._lms_table_cache = cache
    if key is not None and key in cache:
        return cache[key]
    df = spark.read.schema(parquet_schema(spark, path)).parquet(path)
    ts_type = dict(df.dtypes).get("ts") if name == "events" else None
    if ts_type == "bigint":
        # ts surfaces as long nanos (nanosAsLong). Convert to a
        # microsecond timestamp with integer division — NOT float
        # division, which loses precision above 2^53 ns.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Newer driver data stores ts as TIMESTAMP(MICROS) without
        # isAdjustedToUTC, which Spark surfaces as TIMESTAMP_NTZ.
        # The session timezone is pinned to UTC (session.py), so
        # casting to the session-local TIMESTAMP is value-preserving
        # and keeps every downstream plan, window, and DuckDB oracle
        # on the semantics verified in rounds 1-3.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if key is not None:
        cache[key] = df
    return df

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins.
DIM_TABLES = frozenset({"region", "nation"})


class Catalog:
    """Loads and registers the test-data tables for one scale factor."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark rejects
        # outright unless it is surfaced as a long. The conf is
        # runtime-settable, so set it here rather than relying on the
        # session having been built by get_spark() — callers may hand us a
        # vanilla SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
        if name not in self._cache:
            path = f"{self.sf_dir}/{name}.parquet"
            self._cache[name] = _base_table(self.spark, path, name)
        return self._cache[name]

    def register_all(self) -> None:
        """Register every table as a temp view for spark.sql() plans."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)
