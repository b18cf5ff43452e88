"""Schema-contract tests for the cleaning specs — port of the
reference's most valuable assertions (tests/test_connect.py:117,133,
146-147,160-161,124,184-186 — see SURVEY.md section 5)."""

from __future__ import annotations

import datetime as dt

import pytest

from lms_erp_data_integration_spark.operators import ENTITY_SPECS, clean
from lms_erp_data_integration_spark.runparams import RunParams
from pyspark.sql import functions as F

PARAMS = RunParams(term_id="211S", run_date=dt.date(2021, 9, 1))


@pytest.fixture(scope="module")
def raw_users(spark):
    rows = [
        ("1001", 11, "alice"),
        ("1002", 12, "bob"),
        (None, 13, "ghost"),  # F1: null id dropped
        ("sdemo1", 14, "sdemo+demo"),  # F2: non-numeric dropped
        ("CanvasStu9", 15, "synthetic"),  # non-numeric too
    ]
    return spark.createDataFrame(
        rows, "user_id string, canvas_user_id long, login_id string"
    ).withColumn("extra_dummy", F.lit("drop-me"))


def test_clean_users_contract(spark, raw_users):
    out = clean(raw_users, ENTITY_SPECS["users"], PARAMS)
    assert out.columns == ["id_num", "canvas_user", "login_id", "load_date"]
    rows = out.orderBy("id_num").collect()
    assert [r["id_num"] for r in rows] == ["1001", "1002"]
    # data-quality invariant: zero surviving sdemo accounts
    # (tests/test_connect.py:124)
    assert out.where(F.col("login_id").rlike("sdemo+")).count() == 0
    assert all(r["load_date"] == PARAMS.run_date for r in rows)


def test_clean_sections_bit_convention(spark):
    raw = spark.createDataFrame(
        [
            ("C1", "S1", "Sec 1", "active", 1, 101, True),
            ("C2", "S2", "Sec 2", "active", 1, 102, False),
        ],
        "course_id string, section_id string, name string, status string,"
        " account_id long, canvas_section_id long, created_by_sis boolean",
    )
    out = clean(raw, ENTITY_SPECS["sections"], PARAMS)
    assert out.columns == [
        "crs_cde",
        "section_id",
        "name",
        "status",
        "account_id",
        "canvas_section_id",
        "created_by_sis",
        "yr_cde",
        "trm_cde",
        "load_date",
    ]
    # True -> -1, False -> 0, exactly (canvas.py:94-95;
    # test_connect.py:184-186)
    bits = {r["crs_cde"]: r["created_by_sis"] for r in out.collect()}
    assert bits == {"C1": -1, "C2": 0}
    terms = out.select("yr_cde", "trm_cde").distinct().collect()
    assert [(t["yr_cde"], t["trm_cde"]) for t in terms] == [("21", "1S")]


def test_clean_enrollments_nullable_long(spark):
    raw = spark.createDataFrame(
        [
            ("C1", "1001", "student", "S1", "active", 1, 11, True),
            ("C1", None, "student", "S1", "active", 2, 11, False),
        ],
        "course_id string, user_id string, role string, section_id string,"
        " status string, canvas_enrollment_id long, canvas_section_id long,"
        " created_by_sis boolean",
    )
    out = clean(raw, ENTITY_SPECS["enrollments"], PARAMS)
    # T4: user_id nullable long (jenzabar.py:77-78 Int64 semantics)
    field = {f.name: f for f in out.schema.fields}["user_id"]
    assert field.dataType.simpleString() == "bigint"
    vals = sorted(
        (r["user_id"] for r in out.collect()), key=lambda v: (v is None, v)
    )
    assert vals == [1001, None]


def test_clean_is_single_narrow_stage(spark, raw_users):
    """The fused spec must not shuffle — Exchange-free physical plan."""
    out = clean(raw_users, ENTITY_SPECS["users"], PARAMS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_exclude_prefix(spark):
    """F3 (dormant in the reference, canvas.py:89): prefix exclusion."""
    from lms_erp_data_integration_spark.operators.cleaning import CleanSpec

    spec = CleanSpec(
        cols_to_keep=("user_id",), exclude_prefix={"user_id": "CanvasStu"}
    )
    raw = spark.createDataFrame(
        [("CanvasStu1",), ("1001",)], "user_id string"
    )
    out = clean(raw, spec, PARAMS)
    assert [r["user_id"] for r in out.collect()] == ["1001"]
