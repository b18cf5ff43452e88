"""Spark 4 Python Data Source tests: the `canvas_report` format reads
the staged report CSVs through spark.read.format with driver-side REST
planning (fake transport — offline)."""

from __future__ import annotations

import pytest

from lms_erp_data_integration_spark.sources import (
    ENTITY_CSV_SCHEMAS,
    register_canvas_report,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_canvas_report(spark)


def _load(spark, tmp_path, entity, **opts):
    r = (
        spark.read.format("canvas_report")
        .option("term_id", "211S")
        .option("entity", entity)
        .option("stage_dir", str(tmp_path))
        .option("poll_seconds", "0.0")
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_users_typed(spark, tmp_path):
    df = _load(spark, tmp_path, "users")
    assert df.schema == ENTITY_CSV_SCHEMAS["users"]
    rows = sorted(tuple(r) for r in df.collect())
    assert rows[0] == ("1001", 11, "alice")
    assert len(rows) == 3


def test_reads_sections_boolean_conversion(spark, tmp_path):
    df = _load(spark, tmp_path, "sections")
    by_id = {r["section_id"]: r for r in df.collect()}
    assert by_id["MTH101-A"]["created_by_sis"] is True
    assert by_id["PHY201-B"]["created_by_sis"] is False
    assert by_id["MTH101-A"]["account_id"] == 5


def test_dotted_transport_reference(spark, tmp_path):
    df = _load(
        spark,
        tmp_path,
        "courses",
        transport="lms_erp_data_integration_spark.sources.pyds:fake_canvas_transport",
    )
    assert df.count() == 2


def test_unknown_entity_raises(spark, tmp_path):
    with pytest.raises(Exception, match="grades"):
        _load(spark, tmp_path, "grades").collect()
