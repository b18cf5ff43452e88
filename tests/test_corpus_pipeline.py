"""End-to-end web-corpus curation: WARC segments -> visible text +
canonical URL -> quality metrics -> URL + exact-content dedup ->
token-window chunks. Every stage is the registered operator the
queries use; this pins that they COMPOSE — the actual shape of a
Common Crawl ingest job."""

from __future__ import annotations

from lms_erp_data_integration_spark.operators import dedup as dd
from lms_erp_data_integration_spark.operators import text as tx
from lms_erp_data_integration_spark.sources.warc import (
    build_warc,
    register_warc,
)
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _page(body: str) -> bytes:
    return (
        "<html><head><title>x</title><style>a{}</style></head><body>"
        f"<p>{body}</p></body></html>"
    ).encode()


def test_warc_to_training_chunks(spark, tmp_path):
    good = " ".join(f"word{i} of meaningful content here" for i in range(30))
    records = [
        # same page served from two URL variants -> URL dedup collapses
        {"record_type": "response", "http_status": 200,
         "target_uri": "https://www.a.com/page?utm_source=x",
         "content_type": "text/html", "body": _page(good)},
        {"record_type": "response", "http_status": 200,
         "target_uri": "http://a.com/page",
         "content_type": "text/html", "body": _page(good)},
        # same CONTENT on a different site -> exact-text dedup collapses
        {"record_type": "response", "http_status": 200,
         "target_uri": "http://mirror.net/copy",
         "content_type": "text/html", "body": _page(good)},
        # a 404 and a junk page -> filtered out
        {"record_type": "response", "http_status": 404,
         "target_uri": "http://a.com/gone",
         "content_type": "text/html", "body": _page("gone")},
        {"record_type": "response", "http_status": 200,
         "target_uri": "http://spam.biz/x",
         "content_type": "text/html", "body": _page("!!! ### $$$")},
    ]
    seg = tmp_path / "seg-0.warc.gz"
    seg.write_bytes(build_warc(records, gzipped=True))

    register_warc(spark)
    pages = (
        spark.read.format("warc")
        .option("path", str(tmp_path))
        .option("record_type", "response")
        .load()
        .where(F.col("http_status") == 200)
        .select(
            tx.canonical_url(F.col("target_uri")).alias("url"),
            tx.html_to_text(F.col("body").cast("string")).alias("text"),
        )
    )
    # URL dedup: one row per canonical URL
    by_url = pages.withColumn(
        "rn", F.row_number().over(W.partitionBy("url").orderBy("text"))
    ).where("rn = 1").drop("rn")
    assert by_url.count() == 3  # a.com/page, mirror.net/copy, spam.biz/x

    # quality gate: token count + punctuation screens drop the spam page
    q = by_url.select(
        "url", "text",
        *[c.alias(n) for n, c in tx.quality_exprs(F.col("text")).items()],
    )
    kept = q.where((F.col("n_tokens") >= 20) & (F.col("punct_ratio") < 0.2))
    assert kept.count() == 2

    # exact-content dedup: the mirror copy collapses onto the keeper
    docs = kept.select(
        F.row_number().over(W.orderBy("url")).alias("doc_id"), "text"
    )
    dups = dd.exact_duplicates(docs)
    assert dups.count() == 1 and dups.collect()[0]["n_copies"] == 2
    # dedup apply: anti-join the non-keeper duplicate members away
    dup_members = docs.join(
        dups.select("text_hash"), F.md5(docs.text) == F.col("text_hash")
    ).select("doc_id")
    non_keepers = dup_members.subtract(dups.select(F.col("keeper_id").alias("doc_id")))
    cleaned = docs.join(non_keepers, "doc_id", "left_anti")
    assert cleaned.count() == 1

    # chunking: the survivor splits into bounded token windows
    chunks = tx.chunk_documents(cleaned, chunk_size=40, stride=32)
    rows = chunks.collect()
    assert len(rows) >= 3
    texts = [r["chunk_text"] for r in rows]
    assert all(len(t.split()) <= 40 for t in texts)


def test_mixed_document_corpus_to_text(spark):
    """Beyond HTML: a mixed PDF/DOCX/plain corpus goes through the
    document router into the same curation surface."""
    from lms_erp_data_integration_spark.operators import multimodal as mm

    rows = [
        (1, bytearray(mm.build_pdf(["Report text from a PDF."]))),
        (2, bytearray(mm.build_docx(["Memo text from a DOCX."]))),
        (3, b"<html><body><p>Page body text here.</p></body></html>"),
        (4, b"README plain text."),
        (5, bytes([0, 159, 146, 150]) * 3),  # binary junk
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    docs = mm.extract_document_texts(df)
    finished = docs.select(
        "doc_id",
        F.when(
            F.col("doc_format").isin("html", "epub"),
            tx.html_to_text(F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    q = finished.select(
        "doc_id",
        *[c.alias(n) for n, c in tx.quality_exprs(F.col("text")).items()],
    )
    got = {r["doc_id"]: r for r in q.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert all(r["n_tokens"] >= 3 for r in got.values())


def test_image_shard_pipeline_to_normalized_jpegs(spark, tmp_path):
    """The multimodal ingest path end to end: WebDataset tar shards ->
    member rows -> metadata decode -> pHash visual dedup -> transcode
    survivors to normalized JPEGs."""
    import numpy as np

    from lms_erp_data_integration_spark.operators import multimodal as mm
    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from lms_erp_data_integration_spark.sources.webdataset import (
        register_webdataset,
    )
    from tests.test_llm_ops import _textured_image

    base, other = _textured_image(5), _textured_image(55)
    members = [
        ("0001.jpg", encode_jpeg(base, quality=95)),
        ("0002.jpg", encode_jpeg(base, quality=60)),   # visual dup
        ("0003.jpg", encode_jpeg(other, quality=95)),
        ("0004.txt", b"caption sidecar"),
    ]
    (tmp_path / "shard-0.tar").write_bytes(mm.build_tar_shard(members))

    register_webdataset(spark)
    imgs = (
        spark.read.format("webdataset")
        .option("path", str(tmp_path))
        .option("exts", "jpg")
        .load()
        .select(
            F.col("sample_key").cast("long").alias("doc_id"), "payload"
        )
    )
    dups = mm.image_near_duplicates(imgs, max_hamming=8)
    drop = dups.select(F.col("j").alias("doc_id")).distinct()
    keepers = imgs.join(drop, "doc_id", "left_anti")
    out = mm.transcode_images(keepers, 16, 16, quality=92).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3]  # dup 2 dropped, both survivors normalized
    for r in out:
        px = decode_jpeg(bytes(r["payload"]))
        assert px.shape == (16, 16, 3)


def test_warc_stream_matches_batch_and_survives_corruption():
    """r6 ADVICE fixes: iter_warc_stream must (a) equal the batch
    parser on clean segments, plain AND gzipped, while holding only a
    bounded buffer; (b) end iteration on corrupt/truncated gzip
    members instead of raising (a damaged crawl segment must not kill
    the ingest task)."""
    import io

    from lms_erp_data_integration_spark.sources.warc import (
        _gunzip_members,
        iter_warc_records,
        iter_warc_stream,
    )

    records = [
        {
            "record_type": "response",
            "target_uri": f"http://x/{i}",
            "http_status": 200,
            "content_type": "text/html",
            "body": b"<p>pg %d</p>" % i,
        }
        for i in range(7)
    ]
    raw = build_warc(records)
    gz = build_warc(records, gzipped=True)
    for payload in (raw, gz):
        batch = list(iter_warc_records(payload))
        stream = list(iter_warc_stream(io.BytesIO(payload)))
        assert len(batch) == 7
        assert batch == stream

    # corrupt gzip header: returns nothing, never raises (the exact
    # r5 ADVICE repro)
    assert list(iter_warc_records(b"\x1f\x8b\x08\x00garbage")) == []
    assert _gunzip_members(b"\x1f\x8b\x08\x00garbage") == b""
    # truncated tail: the complete prefix records still come out
    got = list(iter_warc_stream(io.BytesIO(gz[: len(gz) - 25])))
    assert 0 < len(got) < 7
    # flipped bytes mid-member: bounded output, no exception
    bad = bytearray(gz)
    bad[len(bad) // 2] ^= 0xFF
    list(iter_warc_stream(io.BytesIO(bytes(bad))))
