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


def test_streaming_reader_two_runs(spark, tmp_path):
    """Streaming form: two bounded report runs — each one micro-batch
    of the full REST cycle, offsets advance by run counter, rows land
    typed; after max_runs the reader reports no new data. (Python
    stream sources fall back to single-batch under availableNow, so
    the test polls a continuous query for both batches.)"""
    import time

    from lms_erp_data_integration_spark.sources.pyds import (
        register_canvas_report,
    )

    register_canvas_report(spark)
    q = (
        spark.readStream.format("canvas_report")
        .option("entity", "users")
        .option("stage_dir", str(tmp_path / "stage"))
        .option("transport", "fake")
        .option("max_runs", "2")
        .load()
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM pyds_stream").count() >= 6:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM pyds_stream").collect()
    # 3 users per report run x 2 runs
    assert len(rows) == 6
    assert {r["login_id"] for r in rows} == {"alice", "bob", "carol"}
    assert all(isinstance(r["canvas_user_id"], int) for r in rows)
    # both run dirs staged (replay source for readBetweenOffsets)
    assert (tmp_path / "stage" / "run_1" / "users.csv").exists()
    assert (tmp_path / "stage" / "run_2" / "users.csv").exists()


def test_streaming_reader_replay_between_offsets(tmp_path):
    """readBetweenOffsets replays committed batches from the staged
    run dirs without a second REST round-trip."""
    from lms_erp_data_integration_spark.sources.csv import (
        ENTITY_CSV_SCHEMAS,
    )
    from lms_erp_data_integration_spark.sources.pyds import (
        CanvasReportStreamReader,
    )

    opts = {
        "entity": "users",
        "stage_dir": str(tmp_path / "stage"),
        "transport": "fake",
    }
    r = CanvasReportStreamReader(opts, ENTITY_CSV_SCHEMAS["users"])
    it1, o1 = r.read(r.initialOffset())
    rows1 = list(it1)
    it2, o2 = r.read(o1)
    assert o1 == {"run": 1} and o2 == {"run": 2}
    assert len(rows1) == 3
    replay = list(r.readBetweenOffsets({"run": 0}, {"run": 2}))
    assert len(replay) == 6
    assert replay[:3] == rows1


# ------------------------------------------- r5: webdataset data source


def test_webdataset_source_reads_shards(spark, tmp_path):
    import numpy as np

    from lms_erp_data_integration_spark.operators import multimodal as mm
    from lms_erp_data_integration_spark.operators.jpeg import encode_jpeg
    from lms_erp_data_integration_spark.sources.webdataset import (
        register_webdataset,
    )
    from pyspark.sql import functions as F

    jpg = encode_jpeg(np.full((4, 4, 3), 70, np.uint8), quality=95)
    for i in range(3):
        members = []
        for k in range(2):
            key = f"{i}_{k:04d}"
            members.append((f"{key}.jpg", jpg))
            members.append((f"{key}.json", b'{"c": "x"}'))
        shard = mm.build_tar_shard(members, gzipped=(i == 2))
        suffix = ".tar.gz" if i == 2 else ".tar"
        with open(tmp_path / f"shard-{i}{suffix}", "wb") as f:
            f.write(shard)

    register_webdataset(spark)
    df = (
        spark.read.format("webdataset")
        .option("path", str(tmp_path))
        .load()
    )
    assert df.count() == 12  # 3 shards x 2 samples x 2 members
    # one partition per shard file
    assert df.rdd.getNumPartitions() == 3
    # sample reassembly: every (shard, key) has both members
    pairs = (
        df.groupBy("shard", "sample_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(pairs) == 6 and all(r["n"] == 2 for r in pairs)
    # ext filter pushes member pruning into the reader itself
    jpgs = (
        spark.read.format("webdataset")
        .option("path", str(tmp_path))
        .option("exts", "jpg")
        .load()
    )
    assert jpgs.count() == 6
    # member bytes decode through the standard image kernels
    metas = mm.extract_image_meta(
        jpgs.select(F.monotonically_increasing_id().alias("doc_id"), "payload")
    ).collect()
    assert all(r["width"] == 4 for r in metas)


# ------------------------------------------------ r5: warc data source


def test_warc_parse_and_spark_ingest(spark, tmp_path):
    """Common Crawl-shaped ingest: .warc.gz segments -> response rows
    -> html_to_text + canonical_url, end to end."""
    from lms_erp_data_integration_spark.operators import text as tx
    from lms_erp_data_integration_spark.sources.warc import (
        build_warc,
        iter_warc_records,
        register_warc,
    )
    from pyspark.sql import functions as F

    page = (b"<html><head><title>t</title></head><body>"
            b"<p>Hello crawl world.</p></body></html>")
    records = [
        {"record_type": "warcinfo", "target_uri": "", "body": b"robots: x"},
        {
            "record_type": "response",
            "target_uri": "https://www.Example.com/a/?utm_source=t",
            "http_status": 200,
            "content_type": "text/html",
            "body": page,
        },
        {
            "record_type": "response",
            "target_uri": "http://other.org/b",
            "http_status": 404,
            "content_type": "text/html",
            "body": b"<html>gone</html>",
        },
    ]
    # local parse sanity, raw and gzipped (per-record gzip members)
    for gz in (False, True):
        got = list(iter_warc_records(build_warc(records, gzipped=gz)))
        assert [r["record_type"] for r in got] == [
            "warcinfo", "response", "response",
        ]
        assert got[1]["http_status"] == 200 and got[1]["body"] == page
        assert got[2]["http_status"] == 404

    for i, gz in enumerate([False, True]):
        name = f"seg-{i}.warc" + (".gz" if gz else "")
        with open(tmp_path / name, "wb") as f:
            f.write(build_warc(records, gzipped=gz))

    register_warc(spark)
    df = (
        spark.read.format("warc")
        .option("path", str(tmp_path))
        .option("record_type", "response")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one per segment file
    rows = (
        df.where(F.col("http_status") == 200)
        .select(
            tx.canonical_url(F.col("target_uri")).alias("url"),
            tx.html_to_text(F.col("body").cast("string")).alias("text"),
        )
        .collect()
    )
    assert len(rows) == 2  # one 200 per segment
    assert all(r["url"] == "example.com/a" for r in rows)
    assert all("Hello crawl world." in r["text"] for r in rows)
    assert all("<" not in r["text"] for r in rows)


def test_warc_chunked_and_gzipped_bodies():
    import gzip

    from lms_erp_data_integration_spark.sources.warc import (
        iter_warc_records,
        split_http_response,
    )

    page = b"<html><body>chunk me</body></html>"
    chunked_body = (
        b"%x\r\n" % 10 + page[:16][:10] + b"\r\n"
        + b"%x\r\n" % (len(page) - 10) + page[10:] + b"\r\n0\r\n\r\n"
    )
    msg = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
           b"Transfer-Encoding: chunked\r\n\r\n" + chunked_body)
    status, ctype, body = split_http_response(msg)
    assert (status, body) == (200, page)

    gz = gzip.compress(page)
    msg2 = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: gzip\r\n\r\n" + gz)
    status2, _, body2 = split_http_response(msg2)
    assert (status2, body2) == (200, page)

    # full record framing still works with the encoded bodies
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/\r\n"
           b"Content-Length: %d\r\n\r\n" % len(msg2)) + msg2 + b"\r\n\r\n"
    got = list(iter_warc_records(rec))
    assert got[0]["body"] == page


def test_warc_stream_reader_exactly_once(spark, tmp_path):
    """Partitioned streaming reader: files present at start are
    ingested in batch 0; files dropped later are picked up by a later
    microbatch; nothing is ingested twice (offsets = planned paths)."""
    from lms_erp_data_integration_spark.sources.warc import (
        build_warc,
        register_warc,
    )
    from pyspark.sql import functions as F

    records = [
        {
            "record_type": "response",
            "target_uri": "https://example.com/x",
            "http_status": 200,
            "content_type": "text/html",
            "body": b"<html><p>hi</p></html>",
        }
    ] * 3
    for i in range(2):
        with open(tmp_path / f"a-{i}.warc", "wb") as f:
            f.write(build_warc(records))

    register_warc(spark)
    stream = (
        spark.readStream.format("warc")
        .option("path", str(tmp_path))
        .load()
        .select("warc_file", "target_uri")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("warc_stream_eo")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("warc_stream_eo")
        assert got.count() == 6  # 2 files x 3 records
        # late-arriving segment (gzipped: both parse paths stream)
        with open(tmp_path / "b-late.warc.gz", "wb") as f:
            f.write(build_warc(records, gzipped=True))
        q.processAllAvailable()
        counts = {
            r["warc_file"]: r["n"]
            for r in got.groupBy("warc_file")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # every file exactly once, including the late one
        assert counts == {"a-0.warc": 3, "a-1.warc": 3, "b-late.warc.gz": 3}
    finally:
        q.stop()


def test_warc_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Offset durability: a NEW streaming query over the same
    checkpoint must resume from the committed offset — segments
    ingested before the stop are not re-ingested, segments dropped
    while stopped are picked up."""
    from lms_erp_data_integration_spark.sources.warc import (
        build_warc,
        register_warc,
    )

    recs = [
        {
            "record_type": "response",
            "target_uri": "https://example.com/y",
            "http_status": 200,
            "content_type": "text/html",
            "body": b"<html><p>r</p></html>",
        }
    ] * 2
    drop = tmp_path / "drop"
    drop.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    with open(drop / "s0.warc", "wb") as f:
        f.write(build_warc(recs))

    register_warc(spark)

    def start():
        return (
            spark.readStream.format("warc")
            .option("path", str(drop))
            .load()
            .select("warc_file", "target_uri")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(sink).count() == 2

    # segment arrives while the query is DOWN
    with open(drop / "s1.warc", "wb") as f:
        f.write(build_warc(recs))
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(sink).groupBy("warc_file").count().collect()
    counts = {r["warc_file"]: r["count"] for r in got}
    # s0 exactly once (not re-ingested after restart), s1 caught up
    assert counts == {"s0.warc": 2, "s1.warc": 2}


def test_warc_stream_offset_compaction(tmp_path):
    """Bounded offsets: past max_tracked_files, already-planned names
    collapse into the floor marker; nothing is lost or duplicated and
    the serialized offset stays bounded."""
    from lms_erp_data_integration_spark.sources.warc import (
        WarcStreamReader,
        build_warc,
    )

    recs = [
        {
            "record_type": "response",
            "target_uri": "https://e.com/z",
            "http_status": 200,
            "content_type": "text/html",
            "body": b"<p>z</p>",
        }
    ]
    for i in range(5):
        with open(tmp_path / f"s{i}.warc", "wb") as f:
            f.write(build_warc(recs))

    r = WarcStreamReader(
        {"path": str(tmp_path), "max_tracked_files": "3"}
    )
    start = r.initialOffset()
    end1 = r.latestOffset()
    planned1 = [p.path for p in r.partitions(start, end1)]
    assert len(planned1) == 5  # first batch plans everything
    assert end1["floor"] == ""  # nothing eligible to compact yet

    # next batch: no new files; compaction kicks in, set shrinks to 3
    end2 = r.latestOffset()
    assert len(end2["files"]) == 3 and end2["floor"].endswith("s1.warc")
    assert r.partitions(end1, end2) == []  # nothing new to ingest

    # a new segment is still ingested exactly once
    with open(tmp_path / "s9.warc", "wb") as f:
        f.write(build_warc(recs))
    end3 = r.latestOffset()
    new = [p.path for p in r.partitions(end2, end3)]
    assert [p.split("/")[-1] for p in new] == ["s9.warc"]

    # restart simulation: fresh reader, checkpointed offset end3 —
    # nothing below the floor or in the tracked set is re-planned
    r2 = WarcStreamReader(
        {"path": str(tmp_path), "max_tracked_files": "3"}
    )
    end4 = r2.latestOffset()
    assert r2.partitions(end3, end4) == []


def test_warc_stream_compaction_spares_unplanned_arrival(tmp_path):
    """r7 ADVICE: an out-of-order segment that is LISTED but not yet
    planned when compaction fires (planned {a,c,d}, then b appears)
    must cap the floor below itself — previously the floor could
    jump past it and the segment was never ingested."""
    from lms_erp_data_integration_spark.sources.warc import (
        WarcStreamReader,
        build_warc,
    )

    recs = [
        {
            "record_type": "response",
            "target_uri": "https://e.com/z",
            "http_status": 200,
            "content_type": "text/html",
            "body": b"<p>z</p>",
        }
    ]
    for name in ("a0.warc", "c2.warc", "d3.warc"):
        with open(tmp_path / name, "wb") as f:
            f.write(build_warc(recs))

    r = WarcStreamReader(
        {"path": str(tmp_path), "max_tracked_files": "2"}
    )
    end1 = r.latestOffset()
    assert len(r.partitions(r.initialOffset(), end1)) == 3

    # b1 sorts between planned a0 and c2 and is visible in the very
    # listing that triggers compaction
    with open(tmp_path / "b1.warc", "wb") as f:
        f.write(build_warc(recs))
    end2 = r.latestOffset()
    assert end2["floor"].endswith("a0.warc")  # capped below b1
    new = [p.path.split("/")[-1] for p in r.partitions(end1, end2)]
    assert new == ["b1.warc"]

    # driver-side tracked set is pruned below the floor (r7 ADVICE
    # low): nothing <= floor lingers in memory, and b1 still ingests
    # exactly once afterwards
    assert all(p > end2["floor"] for p in r._planned)
    end3 = r.latestOffset()
    assert r.partitions(end2, end3) == []
