"""Tests for the r6 composed-curation and media-gate query modules."""

from __future__ import annotations

import pyspark.sql.functions as F

from lms_erp_data_integration_spark.plans import (
    curation_queries,
    media_queries,
    tokenizer_queries,
)
from lms_erp_data_integration_spark.plans.llm_queries import quality_gate


def test_corpus_curate_is_a_subset_chain(spark, sf_dir):
    """Every curation stage only removes rows: kept set must be a
    subset of the gated set, and stats must reconcile with the kept
    rows exactly."""
    out = curation_queries.corpus_curate(spark, sf_dir).collect()
    gated = quality_gate(spark, sf_dir)
    n_gated = gated.count()
    n_kept = sum(r["n_docs"] for r in out)
    assert 0 < n_kept <= n_gated
    # languages in the output must exist in the gated corpus
    langs = {r["lang"] for r in gated.select("lang").distinct().collect()}
    assert {r["lang"] for r in out} <= langs


def test_corpus_curate_rebalance_caps_at_unity(spark, sf_dir):
    """No group may keep more docs than it has (keep-rate clamps at
    100%): per (lang, source) the kept count can't exceed the gated
    count."""
    out = {
        (r["lang"], r["source"]): r["n_docs"]
        for r in curation_queries.corpus_curate(spark, sf_dir).collect()
    }
    gated = {
        (r["lang"], r["source"]): r["cnt"]
        for r in quality_gate(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for key, n in out.items():
        assert n <= gated[key], key


def test_pixel_rows_deterministic_and_complete():
    a = media_queries._pixel_rows(range(media_queries._N_PIXEL_PAYLOADS))
    b = media_queries._pixel_rows(range(media_queries._N_PIXEL_PAYLOADS))
    assert a == b
    assert len(a) == media_queries._N_PIXEL_PAYLOADS  # every fmt decodes
    fmts = {r["fmt"] for r in a}
    assert fmts == set(media_queries._FORMATS) | {
        "tiff_tiled", "jpeg_arith", "jpeg_lossless", "jpeg_arith_prog",
        "jpeg12", "qoi", "jpegls", "jpegls16",
    }
    # base fixtures decode to 3-channel RGB; the codec-family ids
    # alternate gray (1) / RGB (3) on the generator's own parity rules
    # (and QOI's odd ids carry an alpha plane — 4 channels)
    gray_rule = {
        "tiff_tiled": lambda pid: pid % 2 == 0,
        "jpeg_arith": lambda pid: pid % 3 == 0,
        "jpeg_lossless": lambda pid: pid % 2 == 0,
        "jpeg_arith_prog": lambda pid: pid % 3 == 0,
        "jpeg12": lambda pid: pid % 2 == 0,
        "jpegls": lambda pid: pid % 2 == 0,
        "jpegls16": lambda pid: True,  # deep fixtures are all planar
    }
    for r in a:
        pid = r["payload_id"]
        if r["fmt"] == "qoi":
            want = 4 if pid % 2 == 1 else 3
        elif r["fmt"] in gray_rule:
            want = 1 if gray_rule[r["fmt"]](pid) else 3
        else:
            want = 3
        assert r["channels"] == want, (pid, r["fmt"])
        assert r["pixel_crc32"] > 0


def test_video_rows_decode_every_frame():
    rows = media_queries._video_rows(range(media_queries._N_VIDEOS))
    assert len(rows) == media_queries._N_VIDEOS
    for r in rows:
        assert r["frames_decoded"] == r["n_frames"] > 0
        assert r["pixels_crc32"] > 0


def test_media_queries_run_distributed(spark, sf_dir):
    px = media_queries.decode_pixel_checksums(spark, sf_dir)
    assert px.count() == media_queries._N_PIXEL_PAYLOADS
    vf = media_queries.video_frame_stats(spark, sf_dir)
    assert vf.count() == media_queries._N_VIDEOS


def test_video_visual_dedup_flags_planted_pairs(spark, sf_dir):
    """The three QP-20-vs-QP-34 re-encode pairs (0,1) (2,3) (4,5) —
    whose pixel bytes differ — must be the ONLY pairs under the
    8-bits/frame pHash threshold; unique videos 6/7 must not pair
    with anything."""
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in media_queries.video_visual_dedup(spark, sf_dir).collect()
    }
    n = media_queries._N_VISUAL_VIDEOS
    assert len(rows) == n * (n - 1) // 2
    dups = {k for k, r in rows.items() if r["is_dup"]}
    assert dups == {(0, 1), (2, 3), (4, 5)}
    for k in dups:
        assert rows[k]["hamming_sum"] > 0  # near-dup, not byte-equal
    non_pair_min = min(
        r["hamming_sum"] for k, r in rows.items() if k not in dups
    )
    assert non_pair_min > 8 * 3 * 2  # clear margin over the threshold


def test_bpe_encode_uses_frozen_merges(spark, sf_dir):
    out = tokenizer_queries.bpe_encode(spark, sf_dir).collect()
    assert {r["bucket"] for r in out} <= set(range(8))
    for r in out:
        # BPE merges can only shrink the symbol count relative to
        # (chars + end-of-word) and can't go below one per word
        assert r["sum_tokens"] >= r["sum_words"]


def test_chat_render_stats_consistency(spark, sf_dir):
    out = tokenizer_queries.chat_render_stats(spark, sf_dir).collect()
    for r in out:
        assert r["n_turns"] >= 2  # system head + at least one chunk
        assert 0 <= r["assistant_char_frac_micros"] <= 1_000_000
        # rendered length bounds: bos + system turn + per-turn overhead
        assert r["rendered_len"] >= 3 + 42


def test_video_ipp_stats_decodes_every_p_frame(spark, sf_dir):
    """The IPP gate's load-bearing claim: frames_decoded counts ALL
    pictures (IDR + every P) — the per-sample intra path would decode
    only the IDR. Sizes and CRCs must match the fixture geometry."""
    rows = {
        r["doc_id"]: r
        for r in media_queries.video_ipp_stats(spark, sf_dir).collect()
    }
    assert set(rows) == set(range(media_queries._N_IPP_VIDEOS))
    for vid, r in rows.items():
        # every P/B frame decoded (the per-sample intra path would
        # drop them): CAVLC ids 0-7 carry 3+vid%3 frames, the r14
        # CABAC GOP ids 8-13 carry 4+vid%3
        want_n = (3 if vid < 8 else 4) + vid % 3
        assert r["frames_decoded"] == want_n
        assert r["width"] == 16 * (1 + vid % 2)
        assert r["height"] == 16 * (1 + (vid // 2) % 2)
        assert r["crc_sum"] > 0


def test_image_visual_dedup_flags_planted_pairs(spark, sf_dir):
    """The four planted content pairs — incl. the pixel-identical
    PNG/QOI pair and the resized TIFF/JPEG pair — must be flagged as
    duplicates; with zero non-pair band collisions in the fixture,
    candidates are exactly the planted pairs."""
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in media_queries.image_visual_dedup(spark, sf_dir).collect()
    }
    assert set(rows) == {(0, 1), (2, 3), (4, 5), (6, 7)}
    for k, r in rows.items():
        assert r["is_dup"], k
        assert 1 <= r["n_shared_bands"] <= 4
        assert r["hamming"] <= media_queries._IMG_DUP_BITS
    # the PNG/QOI pair is pixel-identical: Hamming 0, all bands shared
    assert rows[(2, 3)]["hamming"] == 0
    assert rows[(2, 3)]["n_shared_bands"] == 4
    # lossy pairs are NEAR dups, not byte-equal hashes
    assert rows[(0, 1)]["hamming"] > 0


def test_crossmodal_components_merges_across_modalities(spark):
    """The components row's reason to exist: a text edge A~B and a
    visual edge B~C must collapse {A,B,C} into ONE cluster with the
    modality mix on the evidence edges — even though A and C never
    matched directly in any modality."""
    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.plans.media_queries import (
        crossmodal_cluster_summary,
    )

    pairs = spark.createDataFrame(
        [
            (10, 20, "text"),     # A~B by text
            (20, 30, "visual"),   # B~C by image
            (40, 50, "both"),     # disjoint pair, both modalities
        ],
        "doc_a long, doc_b long, modality string",
    ).select(
        "doc_a",
        "doc_b",
        F.lit(None).cast("double").alias("text_jaccard"),
        F.lit(None).cast("long").alias("visual_hamming"),
        "modality",
    )
    rows = {r.cluster_id: r for r in crossmodal_cluster_summary(pairs).collect()}
    assert set(rows) == {10, 40}
    merged = rows[10]
    assert (merged.n_members, merged.n_dropped) == (3, 2)
    assert (
        merged.n_text_pairs,
        merged.n_visual_pairs,
        merged.n_both_pairs,
    ) == (1, 1, 0)
    assert (rows[40].n_members, rows[40].n_both_pairs) == (2, 1)
