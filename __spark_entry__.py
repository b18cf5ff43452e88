"""Driver contract for the spark-graft builder (PySpark target).

Thin views over the engine's query registry
(``lms_erp_data_integration_spark.plans.registry``): every implemented
operator from SURVEY.md section 2 registers a Spark plan and (where
SQL-expressible) a DuckDB oracle there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lms_erp_data_integration_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the bidirectional daily-enrollment sync diff (Q5,
    SURVEY.md section 2.4) on sf0.001."""
    return plans.QUERIES["sync_daily_enrollment"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md section 2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every hash-checkable query."""
    return dict(plans.ORACLES)
