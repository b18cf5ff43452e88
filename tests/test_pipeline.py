"""Mirror writes, ordered sink application, run report (SURVEY.md M5)."""

from __future__ import annotations

import pytest

from lms_erp_data_integration_spark.pipeline import (
    SyncPipeline,
    UPDATE_ORDER,
    mirror_table_name,
    run_report,
    write_mirror,
)
from lms_erp_data_integration_spark.pipeline.mirror import read_mirror
from pyspark.sql import functions as F


def test_mirror_allowlist():
    assert mirror_table_name("users") == "rpc_re_canvas_users"
    # exact reference behavior: NameError (src/jenzabar.py:42-43)
    with pytest.raises(NameError):
        mirror_table_name("grades")


def test_mirror_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [("C1", "21", "1S"), ("C2", "21", "2S")],
        "crs_cde string, yr_cde string, trm_cde string",
    )
    path = write_mirror(df, "courses", str(tmp_path))
    assert path.endswith("rpc_re_canvas_courses")
    back = read_mirror(spark, "courses", str(tmp_path))
    assert back.count() == 2
    # partition pruning: a term-sliced read scans one partition only
    pruned = back.where((F.col("yr_cde") == "21") & (F.col("trm_cde") == "1S"))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr_cde" in plan


def test_mirror_overwrite_is_per_partition(spark, tmp_path):
    """Refreshing one term must not wipe the other terms' mirror data
    (dynamic partition overwrite, not static)."""
    both = spark.createDataFrame(
        [("C1", "21", "1S"), ("C2", "21", "2S")],
        "crs_cde string, yr_cde string, trm_cde string",
    )
    write_mirror(both, "courses", str(tmp_path))
    refresh_1s = spark.createDataFrame(
        [("C9", "21", "1S")], "crs_cde string, yr_cde string, trm_cde string"
    )
    write_mirror(refresh_1s, "courses", str(tmp_path))
    back = read_mirror(spark, "courses", str(tmp_path))
    rows = {(r.crs_cde, r.trm_cde) for r in back.collect()}
    # 1S replaced, 2S untouched
    assert rows == {("C9", "1S"), ("C2", "2S")}


def test_pipeline_fk_order_and_report(spark):
    users = spark.createDataFrame(
        [(1, "a", "active")], "user_id long, login_id string, status string"
    )
    enr = spark.createDataFrame(
        [(1, "C1", "active"), (2, "C1", "deleted")],
        "user_id long, course_id string, status string",
    )
    updates = {"enrollments": enr, "student_users": users}
    seen: list[str] = []
    pipe = SyncPipeline(lambda name, df: seen.append(name))
    applied = pipe.apply(updates)
    # FK order preserved regardless of dict order (canvas.py:108-116)
    assert applied == ["student_users", "enrollments"] == seen

    report = {r["entity"]: r for r in run_report(updates).collect()}
    assert report["enrollments"]["n_active"] == 1
    assert report["enrollments"]["n_deleted"] == 1
    assert report["student_users"]["n_rows"] == 1
    assert report["student_users"]["kind"] == "Account"

    with pytest.raises(NameError):
        pipe.apply({"grades": users})


def test_update_order_matches_reference():
    assert UPDATE_ORDER == (
        "faculty_users",
        "student_users",
        "courses",
        "sections",
        "enrollments",
        "ctl_library_courses",
        "ctl_library_sections",
    )


def test_upsert_mirror_partition_scoped(spark, tmp_path):
    from lms_erp_data_integration_spark.pipeline.mirror import (
        read_mirror,
        upsert_mirror,
        write_mirror,
    )

    base = str(tmp_path / "mirror")
    initial = spark.createDataFrame(
        [
            ("2025", "FA", 1, "alice"),
            ("2025", "FA", 2, "bob"),
            ("2026", "SP", 3, "carol"),
        ],
        "yr_cde string, trm_cde string, id long, name string",
    )
    write_mirror(initial, "users", base)

    # update key 2, insert key 4 — both in the 2025/FA partition only
    delta = spark.createDataFrame(
        [("2025", "FA", 2, "bob2"), ("2025", "FA", 4, "dan")],
        "yr_cde string, trm_cde string, id long, name string",
    )
    upsert_mirror(spark, delta, "users", base, key_cols=("id",))

    # partition discovery re-infers yr_cde as int on read-back —
    # normalize to str so the assertion pins values, not inference
    rows = {
        r["id"]: (str(r["yr_cde"]), r["trm_cde"], r["name"])
        for r in read_mirror(spark, "users", base).collect()
    }
    assert rows == {
        1: ("2025", "FA", "alice"),
        2: ("2025", "FA", "bob2"),
        4: ("2025", "FA", "dan"),
        3: ("2026", "SP", "carol"),  # untouched partition intact
    }


def test_pipeline_observed_metrics(spark):
    """observe=True: change counts ride the sink's own action (no
    extra aggregation pass), matching run_report's numbers."""
    enr = spark.createDataFrame(
        [(1, "C1", "active"), (2, "C1", "deleted"), (3, "C2", "active")],
        "user_id long, course_id string, status string",
    )
    users = spark.createDataFrame(
        [(1, "a")], "user_id long, login_id string"
    )
    counted: list[int] = []
    pipe = SyncPipeline(
        lambda name, df: counted.append(df.count()), observe=True
    )
    pipe.apply({"enrollments": enr, "student_users": users})
    assert counted == [1, 3]
    assert pipe.observed["enrollments"] == {
        "n_rows": 3,
        "n_active": 2,
        "n_deleted": 1,
    }
    # no status column -> everything counts as active
    assert pipe.observed["student_users"] == {
        "n_rows": 1,
        "n_active": 1,
        "n_deleted": 0,
    }
