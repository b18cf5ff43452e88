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
# resolved path, VALIDATED against the table's stat fingerprint so a
# rewritten fixture (tests build their own sf dirs) can never serve a
# stale schema, and single-entry-per-path (r14 ADVICE: a rewrite
# EVICTS the stale entry instead of accumulating beside it); only
# table METADATA is cached — every query still computes its data from
# the parquet bytes.
_SCHEMA_CACHE: dict[str, tuple[tuple, StructType]] = {}


def _stat_fingerprint(path: str) -> tuple | None:
    """Change fingerprint for a parquet file OR directory table. For a
    plain file: (mtime_ns, size). For a directory (Spark-written
    table), the directory's own stat does not change when a part-file
    is rewritten in place (r14 ADVICE #4), so fold every child
    entry's (name, mtime_ns, size) into the fingerprint — one scandir,
    no file reads. Returns None when the path cannot be stat'ed (e.g.
    a non-local URI): callers then skip caching entirely."""
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_mtime_ns, st.st_size)
        entries = []
        with os.scandir(path) as it:
            for e in it:
                es = e.stat()
                entries.append((e.name, es.st_mtime_ns, es.st_size))
        return (st.st_mtime_ns, st.st_size, tuple(sorted(entries)))
    except OSError:
        return None


def parquet_schema(spark: SparkSession, path: str) -> StructType:
    """Inferred schema of a parquet file/dir, cached per path and
    invalidated on any stat-fingerprint change. Shared by the batch
    catalog and the file-stream sources so both modes skip per-query
    re-inference."""
    fp = _stat_fingerprint(path)
    if fp is None:
        # non-local path (e.g. an hdfs:// URI in a future deployment):
        # fall through to plain inference, uncached
        return spark.read.parquet(path).schema
    hit = _SCHEMA_CACHE.get(path)
    if hit is None or hit[0] != fp:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = (fp, schema)
        return schema
    return hit[1]


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
    frames bound to a stopped context), is single-entry-per-path (a
    rewrite EVICTS the stale frame — r14 ADVICE #3), and the stat
    fingerprint invalidates on rewrite exactly like the schema cache
    (directory tables fold child-entry stats in — ADVICE #4)."""
    fp = _stat_fingerprint(path)
    cache = getattr(spark, "_lms_table_cache", None)
    if cache is None:
        cache = {}
        spark._lms_table_cache = cache
    if fp is not None:
        hit = cache.get(path)
        if hit is not None and hit[0] == fp:
            return hit[1]
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
    if fp is not None:
        cache[path] = (fp, df)
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
