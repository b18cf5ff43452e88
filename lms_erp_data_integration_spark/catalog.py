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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            ts_type = dict(df.dtypes).get("ts") if name == "events" else None
            if ts_type == "bigint":
                # ts surfaces as long nanos (nanosAsLong). Convert to a
                # microsecond timestamp with integer division — NOT float
                # division, which loses precision above 2^53 ns.
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif ts_type == "timestamp_ntz":
                # Newer driver data stores ts as TIMESTAMP(MICROS) without
                # isAdjustedToUTC, which Spark surfaces as TIMESTAMP_NTZ.
                # The session timezone is pinned to UTC (session.py), so
                # casting to the session-local TIMESTAMP is value-preserving
                # and keeps every downstream plan, window, and DuckDB oracle
                # on the semantics verified in rounds 1-3.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            self._cache[name] = df
        return self._cache[name]

    def register_all(self) -> None:
        """Register every table as a temp view for spark.sql() plans."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)
