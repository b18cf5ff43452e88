"""CSV source/sink (SURVEY.md S1/S2) with EXPLICIT schemas.

The reference loads every CSV with inferred dtypes
(``src/canvas.py:63``, ``src/jenzabar.py:39``); at scale inference costs
an extra pass and silently drifts, so the engine declares the raw
provisioning-report schemas (FIXTURES.md section A) and fails loudly on
mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ENTITY_CSV_SCHEMAS: dict[str, T.StructType] = {
    "users": T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("canvas_user_id", T.LongType()),
            T.StructField("login_id", T.StringType()),
        ]
    ),
    "courses": T.StructType(
        [
            T.StructField("canvas_course_id", T.LongType()),
            T.StructField("course_id", T.StringType()),
            T.StructField("status", T.StringType()),
        ]
    ),
    "sections": T.StructType(
        [
            T.StructField("course_id", T.StringType()),
            T.StructField("section_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("account_id", T.LongType()),
            T.StructField("canvas_section_id", T.LongType()),
            T.StructField("created_by_sis", T.BooleanType()),
        ]
    ),
    "enrollments": T.StructType(
        [
            T.StructField("course_id", T.StringType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("role", T.StringType()),
            T.StructField("section_id", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("canvas_enrollment_id", T.LongType()),
            T.StructField("canvas_section_id", T.LongType()),
            T.StructField("created_by_sis", T.BooleanType()),
        ]
    ),
}


def read_entity_csv(spark: SparkSession, path: str, entity: str) -> DataFrame:
    """Read a raw provisioning-report CSV with the declared schema.
    Extra columns in the file are dropped (the cleaning step projects
    anyway); missing declared columns come back null and fail the
    cleaning contract tests — loud, not silent."""
    if entity not in ENTITY_CSV_SCHEMAS:
        raise KeyError(f"no CSV schema for entity {entity!r}")
    return (
        spark.read.option("header", True)
        .schema(ENTITY_CSV_SCHEMAS[entity])
        .csv(path)
    )


def write_sis_csv(df: DataFrame, path: str) -> None:
    """Write a Canvas-SIS-import-shaped CSV (header, no index column —
    ``src/canvas.py:59``/``jenzabar.py:66`` file layout). Single file
    per update: SIS imports are one-POST-per-file."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
