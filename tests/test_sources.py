"""Connector-layer tests (SURVEY.md S1/S2/S5-S9) with a fake transport —
offline parity for the reference's canvasapi/SQLAlchemy couplings."""

from __future__ import annotations

import io
import zipfile

import pytest

from lms_erp_data_integration_spark.sources import (
    ENTITY_CSV_SCHEMAS,
    ReportSource,
    SISImportSink,
    jdbc_options,
    read_entity_csv,
    write_sis_csv,
)


class FakeCanvas:
    """In-memory Canvas: one poll cycle before completion, zip payload."""

    def __init__(self):
        self.calls: list[tuple[str, str]] = []
        self.report_polls = 0
        self.import_polls = 0

    def __call__(self, method, url, payload):
        self.calls.append((method, url))
        if url.endswith("/reports") and method == "POST":
            return {"id": 7}
        if "/reports/7" in url:
            self.report_polls += 1
            if self.report_polls < 2:
                return {"status": "running"}
            return {"status": "complete", "attachment_url": "http://x/blob.zip"}
        if url.endswith("blob.zip"):
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as zf:
                zf.writestr("users.csv", "user_id,canvas_user_id,login_id\n1,11,a\n")
                zf.writestr("courses.csv", "canvas_course_id,course_id,status\n")
            return buf.getvalue()
        if url.endswith("/sis_imports") and method == "POST":
            return {"id": 9}
        if "/sis_imports/9" in url:
            self.import_polls += 1
            if self.import_polls < 2:
                return {"progress": 50}
            return {"progress": 100, "statistics": {"Account": {"created": 1}}}
        raise AssertionError(f"unexpected {method} {url}")


def test_report_source_poll_unzip(tmp_path):
    fake = FakeCanvas()
    src = ReportSource(fake, "http://canvas", poll_seconds=0.0)
    files = src.fetch("211S", str(tmp_path))
    assert sorted(f.rsplit("/", 1)[1] for f in files) == ["courses.csv", "users.csv"]
    assert (tmp_path / "users.csv").read_text().startswith("user_id,")
    assert fake.report_polls == 2  # polled until complete


def test_report_source_rejects_zip_slip(tmp_path):
    """A member path like '../evil' must not escape the stage dir."""

    def evil(method, url, payload):
        if url.endswith("/reports") and method == "POST":
            return {"id": 1}
        if "/reports/1" in url:
            return {"status": "complete", "attachment_url": "http://x/z.zip"}
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("../evil.csv", "boom\n")
        return buf.getvalue()

    src = ReportSource(evil, "http://c", poll_seconds=0.0)
    dest = tmp_path / "stage"
    dest.mkdir()
    with pytest.raises(ValueError, match="escapes"):
        src.fetch("211S", str(dest))
    assert not (tmp_path / "evil.csv").exists()


def test_sis_import_sink_polls_to_100():
    fake = FakeCanvas()
    sink = SISImportSink(fake, "http://canvas", poll_seconds=0.0)
    status = sink("faculty_users", b"user_id,login_id,status\n")
    assert status["progress"] == 100
    assert sink.results[0]["file"] == "faculty_users"
    assert sink.results[0]["statistics"]["Account"]["created"] == 1


def test_report_source_timeout():
    def never_done(method, url, payload):
        return {"id": 1} if method == "POST" else {"status": "running"}

    src = ReportSource(never_done, "http://c", poll_seconds=0.0, max_polls=3)
    with pytest.raises(TimeoutError):
        src.fetch("211S", "/tmp/nowhere")


def test_entity_csv_roundtrip(spark, tmp_path):
    raw = spark.createDataFrame(
        [("1001", 11, "alice")], ENTITY_CSV_SCHEMAS["users"]
    )
    out = str(tmp_path / "users_csv")
    write_sis_csv(raw, out)
    back = read_entity_csv(spark, out, "users")
    assert back.schema == ENTITY_CSV_SCHEMAS["users"]
    assert [tuple(r) for r in back.collect()] == [("1001", 11, "alice")]
    with pytest.raises(KeyError):
        read_entity_csv(spark, out, "grades")


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """Real spark.read/write.jdbc round-trip through the Derby embedded
    driver that ships in the Spark distribution — closes the S5 source
    end-to-end (no external DB needed; same truncate/batchsize options
    the production path uses)."""
    url = f"jdbc:derby:{tmp_path}/erpdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame(
        [(1001, 11, "alice"), (1002, 12, "bob")],
        "user_id long, canvas_user_id long, login_id string",
    )
    df.write.jdbc(url, "rpc_re_canvas_users", mode="overwrite", properties=props)
    back = spark.read.jdbc(url, "rpc_re_canvas_users", properties=props)
    assert sorted((r.user_id, r.login_id) for r in back.collect()) == [
        (1001, "alice"),
        (1002, "bob"),
    ]
    # snapshot-overwrite semantics: second write replaces, not appends
    df.limit(1).write.jdbc(
        url, "rpc_re_canvas_users", mode="overwrite", properties=props
    )
    assert spark.read.jdbc(url, "rpc_re_canvas_users", properties=props).count() == 1


def test_jdbc_options_escape_and_batch():
    opts = jdbc_options("db.host", "ERP", "svc", "p@ss;word", "rpc_re_canvas_users")
    assert opts["url"] == "jdbc:sqlserver://db.host;databaseName=ERP"
    # the discrete 'password' option is passed verbatim to the driver —
    # URL-escaping it (as the reference does for its URL) would corrupt it
    assert opts["password"] == "p@ss;word"
    assert opts["batchsize"] == "10000" and opts["truncate"] == "true"
