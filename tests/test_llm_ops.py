"""Unit tests for the LLM-data operators (SURVEY.md M7) on inline
frames with known answers."""

from __future__ import annotations

import pytest

from lms_erp_data_integration_spark.operators import dedup as dd
from lms_erp_data_integration_spark.operators import multimodal as mm
from lms_erp_data_integration_spark.operators import similarity as sim
from lms_erp_data_integration_spark.operators import text as tx
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different words entirely here now folks"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    out = dd.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["keeper_id"] == 1 and out[0]["n_copies"] == 2


def test_word_shingles(spark, docs):
    sh = tx.word_shingles(docs.where(F.col("doc_id") == 1), "doc_id", "text", 3)
    got = {r["shingle"] for r in sh.collect()}
    assert "the quick brown" in got and "the lazy dog" in got
    assert len(got) == 7  # 9 tokens -> 7 trigrams


def test_ngram_jaccard_finds_near_dup(spark, docs):
    out = dd.ngram_jaccard_duplicates(docs, threshold=0.5).collect()
    pairs = {(r["i"], r["j"]): r["jaccard"] for r in out}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0  # near dup
    assert all(3 not in p for p in pairs)


def test_ngram_jaccard_hot_shingle_guard(spark, docs):
    # with max_doc_freq=1 every shared shingle is "hot": no candidate
    # can form, proving the posting-list join is bounded by the cap
    out = dd.ngram_jaccard_duplicates(docs, threshold=0.5, max_doc_freq=1)
    assert out.count() == 0
    from lms_erp_data_integration_spark.caching import release_cached

    release_cached()


def test_release_cached_unpersists(spark, docs):
    from lms_erp_data_integration_spark.caching import release_cached

    release_cached()  # drop anything earlier tests left behind

    def persistent_ids() -> set[int]:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().keys().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    # Compare RDD-id SETS, not counts: localCheckpoint RDDs from
    # earlier tests in this shared session (pagerank/k-means lineage
    # truncation) also sit in getPersistentRDDs and the ContextCleaner
    # may reclaim them at any GC — counts can move both ways under us.
    base = persistent_ids()
    dd.ngram_jaccard_duplicates(docs, threshold=0.5).collect()
    added = persistent_ids() - base
    assert added  # operator did cache something new
    assert release_cached() > 0
    assert not (persistent_ids() & added)  # the new caches were freed


def test_minhash_fused_equals_slots(spark, docs):
    """The fused single-expression signature (one nested transform,
    affine params as array literals — the streaming paths' narrow
    per-micro-batch plan since r13) computes bit-identical signatures
    to the per-slot formulation on every document."""
    from pyspark.sql import functions as F

    a = dd.minhash_signatures(docs, 16, persist=False)
    b = dd.minhash_signatures(docs, 16, persist=False, fused=True)
    diff = (
        a.alias("a")
        .join(b.alias("b"), "doc_id")
        .where(F.expr("a.sigs <> b.sigs"))
        .count()
    )
    assert diff == 0
    assert a.count() == b.count()


def test_minhash_agrees_with_exact_on_high_jaccard(spark, docs):
    exact = {
        (r["i"], r["j"])
        for r in dd.ngram_jaccard_duplicates(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["i"], r["j"])
        for r in dd.minhash_near_duplicates(docs, threshold=0.5).collect()
    }
    assert lsh <= exact  # LSH+verify can only miss, never invent
    assert (1, 4) in lsh  # identical docs always collide


def test_simhash_identical_docs_zero_distance(spark, docs):
    out = dd.simhash_near_duplicates(docs, max_hamming=3, bits=32).collect()
    d = {(r["i"], r["j"]): r["hamming"] for r in out}
    assert d[(1, 4)] == 0


def test_cosine_topk(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.05]),
        ],
        "vec_id long, embedding array<float>",
    )
    queries = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.brute_force_topk(vecs, queries, k=2).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [3, 1]


def test_ivf_search_within_cluster(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.95, 0.05], 0),
            (2, [0.0, 1.0], 1),
            (3, [0.05, 0.95], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    centroids = vecs.groupBy(F.col("label").alias("centroid_id")).agg(
        F.min_by("embedding", "vec_id").alias("embedding")
    )
    queries = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.ivf_topk(vecs, queries, centroids, k=10).collect()
    # only the same-cluster neighbor is searched
    assert [r["neighbor_id"] for r in out] == [1]


def test_language_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "el gato de la casa que habla"),
            (3, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", tx.language_id_expr(F.col("text")).alias("lang")
        ).collect()
    }
    assert got == {1: "en", 2: "es", 3: "und"}
    q = df.select(*[c.alias(n) for n, c in tx.quality_exprs(F.col("text")).items()])
    row = q.collect()[0]
    assert row["n_tokens"] == 8 and row["punct_ratio"] == 0.0


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, "ba")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", tx.fingerprint_expr(F.col("text")).alias("fp")
    ).collect()}
    # h("ab") = (0*131+97)*131+98 ; order matters
    assert out[1] == 97 * 131 + 98
    assert out[2] == 98 * 131 + 97
    assert out[1] != out[2]


def test_multimodal_mapinpandas_plumbing(spark, docs):
    with_payload = mm.attach_payload(docs)
    meta = mm.extract_image_meta(with_payload)
    rows = {r["doc_id"]: r for r in meta.collect()}
    assert set(rows) == {1, 2, 3, 4}
    r1 = rows[1]
    n = len("the quick brown fox jumps over the lazy dog".encode())
    assert r1["n_bytes"] == n
    assert r1["width"] == 64 + n % 576 and r1["channels"] == 3
    assert r1["pixel_mean"] > 0


def test_multimodal_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_image_stub(b"bytes")


def _ppm_bytes(w, h, pixels):
    """Minimal binary PPM (P6) with a comment line in the header."""
    return (
        b"P6\n# synthetic test raster\n%d %d\n255\n" % (w, h)
        + bytes(pixels)
    )


def _bmp_bytes(w, h, rows_bottom_up):
    """Uncompressed 24-bit BMP; each row padded to a 4-byte stride."""
    import struct as st

    stride = (w * 3 + 3) & ~3
    data = b"".join(
        bytes(r) + b"\x00" * (stride - w * 3) for r in rows_bottom_up
    )
    header = st.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                  2835, 2835, 0, 0)
    return header + dib + data


def test_decode_image_real_ppm():
    # 2x2 RGB, 12 samples 0..11 -> mean 5.5
    meta = mm.decode_image(_ppm_bytes(2, 2, range(12)))
    assert meta == {
        "n_bytes": len(_ppm_bytes(2, 2, range(12))),
        "width": 2,
        "height": 2,
        "channels": 3,
        "pixel_mean": 5.5,
    }
    # PGM single-channel
    pgm = b"P5\n3 1\n255\n" + bytes([10, 20, 30])
    m = mm.decode_image(pgm)
    assert (m["width"], m["height"], m["channels"]) == (3, 1, 1)
    assert m["pixel_mean"] == 20.0


def test_decode_image_real_bmp():
    # 3x2 BGR rows (bottom-up); mean over the 18 payload samples,
    # alignment padding excluded
    rows = [list(range(9)), list(range(9, 18))]
    meta = mm.decode_image(_bmp_bytes(3, 2, rows))
    assert (meta["width"], meta["height"], meta["channels"]) == (3, 2, 3)
    assert meta["pixel_mean"] == sum(range(18)) / 18


def test_decode_image_unrecognized_returns_none():
    assert mm.decode_image(b"the quick brown fox") is None
    assert mm.decode_image(b"") is None
    assert mm.decode_image(b"P6\n2 2\n255\n\x00") is None  # truncated
    assert mm.decode_image(b"BM" + b"\x00" * 10) is None  # short header


def test_multimodal_real_decode_through_spark(spark):
    """The mapInPandas path must route recognized rasters through the
    real decoder and everything else through the deterministic fake —
    mixed in one DataFrame."""
    ppm = _ppm_bytes(2, 2, range(12))
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in mm.extract_image_meta(df).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (2, 2)
    assert rows[1]["pixel_mean"] == 5.5
    fake = mm.decode_image_stub(b"not an image", fake=True)
    assert rows[2]["width"] == fake["width"]
    assert rows[2]["pixel_mean"] == pytest.approx(fake["pixel_mean"])


def test_frame_sampling(spark, docs):
    frames = mm.sample_frames(mm.attach_payload(docs), every_n_bytes=16)
    per_doc = {
        r["doc_id"]: r["count"]
        for r in frames.groupBy("doc_id").count().collect()
    }
    assert per_doc[1] == 3  # 43 bytes -> offsets 0,16,32


def test_near_dup_fast_equals_exprs(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i % 7) + 0.1 * d for d in range(8)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    fast = {
        (r["i"], r["j"]): r["cosine"]
        for r in sim.near_duplicate_pairs_local(vecs, 0.99).collect()
    }
    exprs = {
        (r["i"], r["j"]): r["cosine"]
        for r in sim.near_duplicate_pairs_exprs(vecs, 0.99).collect()
    }
    assert fast == exprs  # bit-for-bit, including threshold boundaries
    assert len(fast) > 0
    blocked = {
        (r["i"], r["j"]): r["cosine"]
        for r in sim.near_duplicate_pairs_blocked(vecs, 0.99, n_blocks=4).collect()
    }
    assert blocked == exprs  # distributed blocked form, same bits


def test_near_dup_blocked_enforces_block_size(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="max_block_rows"):
        sim.near_duplicate_pairs_blocked(
            vecs, 0.5, n_blocks=2, max_block_rows=5
        ).collect()


def test_duplicate_clusters_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)], "i long, j long"
    )
    out = {
        r["member"]: r["cluster_id"]
        for r in dd.duplicate_clusters(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_kmeans_assignments_partition_and_determinism(spark):
    vecs = spark.createDataFrame(
        [
            (i, [float((i % 3) * 10 + d % 2) for d in range(4)])
            for i in range(30)
        ],
        "vec_id long, embedding array<float>",
    )
    a = sim.kmeans_assignments(vecs, k=3, iterations=2)
    rows = {r["vec_id"]: r["cid"] for r in a.collect()}
    assert len(rows) == 30  # every vector assigned exactly once
    # three well-separated planted clusters must be recovered: all
    # vectors with the same i%3 share a centroid
    groups = {m: {v for v, c in rows.items() if c == m} for m in set(rows.values())}
    assert sorted(len(g) for g in groups.values()) == [10, 10, 10]
    for g in groups.values():
        assert len({v % 3 for v in g}) == 1
    # deterministic: a second run gives the identical assignment
    b = {r["vec_id"]: r["cid"] for r in sim.kmeans_assignments(vecs, k=3, iterations=2).collect()}
    assert rows == b


def test_kmeans_two_level_degenerate_equals_flat(spark):
    # coarse_groups=k makes every centroid its own singleton coarse
    # cell (each seeds itself at distance 0), so the two-level pruned
    # scan must reduce EXACTLY to the flat scan — same argmin, same
    # tie-breaks, same iteration trajectory.
    vecs = spark.createDataFrame(
        [
            (i, [float(((i * 7 + d * 3) % 11) - 5) for d in range(4)])
            for i in range(40)
        ],
        "vec_id long, embedding array<float>",
    )
    flat = {
        r["vec_id"]: r["cid"]
        for r in sim.kmeans_assignments(vecs, k=5, iterations=2).collect()
    }
    two = {
        r["vec_id"]: r["cid"]
        for r in sim.kmeans_assignments(
            vecs, k=5, iterations=2, coarse_groups=5
        ).collect()
    }
    assert flat == two


def _two_level_kmeans_ref(raw, k, iterations, g):
    """Pure-Python replica of the pruned two-level assignment — the
    same integer scaling, sequential-fold distances, and lower-id tie
    breaks as kmeans_assignments(coarse_groups=g). An exact oracle for
    the PRUNED semantics (a point takes the best centroid IN ITS
    nearest coarse cell, which need not be the global argmin)."""
    import math

    pts = {i: [math.floor(x * 1_000_000 + 0.5) * 1.0 for x in v] for i, v in raw}

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            d = x - y
            acc = acc + d * d
        return acc

    state = {i: (list(pts[i]), 1.0) for i in sorted(pts) if i < k}
    assign = None
    for _ in range(iterations):
        seeds = sorted(state)[:g]
        ga = {}
        for cid, (S, n) in state.items():
            mean_c = [s / n for s in S]
            best = min(
                (sqd(mean_c, [s / state[gid][1] for s in state[gid][0]]), gid)
                for gid in seeds
            )
            ga[cid] = best[1]
        gstate = {}
        for cid, gid in ga.items():
            S, n = state[cid]
            gS, gn = gstate.get(gid, ([0.0] * len(S), 0.0))
            gstate[gid] = ([a + b for a, b in zip(gS, S)], gn + n)
        assign = {}
        for pid, v in pts.items():
            pg = min(
                (sqd(v, [s / gn for s in gS]), gid)
                for gid, (gS, gn) in gstate.items()
            )[1]
            cell = [cid for cid, gid in ga.items() if gid == pg]
            assign[pid] = min(
                (sqd(v, [s / state[cid][1] for s in state[cid][0]]), cid)
                for cid in cell
            )[1]
        nxt = {}
        for pid, cid in assign.items():
            S, n = nxt.get(cid, ([0.0] * len(pts[pid]), 0.0))
            nxt[cid] = ([a + b for a, b in zip(S, pts[pid])], n + 1.0)
        state = nxt
    return assign


def test_kmeans_two_level_total_and_deterministic(spark):
    # pruned path with g < k: every point assigned exactly once (no
    # point lost to an empty coarse cell), the assignment matches an
    # exact pure-Python replica of the pruned semantics, and reruns
    # are bit-identical. (Planted-structure recovery is NOT asserted:
    # the pruned argmin is approximate in the standard IVF sense —
    # a point equidistant between coarse cells may take an in-cell
    # centroid that is not the global nearest.)
    raw = [
        (i, [float((i % 4) * 100 + (d * i) % 3) for d in range(4)])
        for i in range(40)
    ]
    vecs = spark.createDataFrame(raw, "vec_id long, embedding array<float>")
    a = {
        r["vec_id"]: r["cid"]
        for r in sim.kmeans_assignments(
            vecs, k=4, iterations=2, coarse_groups=2
        ).collect()
    }
    assert len(a) == 40
    assert a == _two_level_kmeans_ref(raw, k=4, iterations=2, g=2)
    b = {
        r["vec_id"]: r["cid"]
        for r in sim.kmeans_assignments(
            vecs, k=4, iterations=2, coarse_groups=2
        ).collect()
    }
    assert a == b


def test_repetition_stats(spark):
    rows = [
        (1, "a b c d e"),                # no repetition
        (2, "x y x y x y x y"),          # heavy token + trigram repeats
        (3, "solo"),                     # < 3 tokens: zero trigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.repetition_stats(df).collect()}
    assert out[1]["dup_token_frac"] == 0.0
    assert out[1]["dup_trigram_frac"] == 0.0
    # doc 2: 8 tokens, 2 distinct -> 6/8; 6 trigrams, 2 distinct -> 4/6
    assert out[2]["n_tokens"] == 8 and out[2]["n_distinct_tokens"] == 2
    assert out[2]["dup_token_frac"] == 6 / 8
    assert out[2]["n_trigrams"] == 6 and out[2]["n_distinct_trigrams"] == 2
    assert out[2]["dup_trigram_frac"] == 4 / 6
    # doc 3: no trigrams -> guarded zero, not null/NaN
    assert out[3]["n_trigrams"] == 0 and out[3]["dup_trigram_frac"] == 0.0


def test_cross_corpus_contamination(spark):
    train = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),   # shares 3 trigrams w/ eval 1
            (11, "alpha beta gamma nothing else"),    # shares 1 trigram
            (12, "totally unrelated words right here"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = dd.cross_corpus_contamination(train, ev, shingle_n=3, min_shared=2)
    rows = {(r["train_id"], r["eval_id"]): r["shared_ngrams"] for r in out.collect()}
    assert rows == {(10, 1): 3}


def test_pq_codes_planted_subspaces(spark):
    # 4 seed vectors (ids 0-3) are the centroids; vectors 10-13 copy
    # seed (i % 4) exactly, so every subspace code must equal i % 4
    import random

    rng = random.Random(3)
    seeds = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(4)]
    rows = [(i, seeds[i]) for i in range(4)]
    rows += [(10 + i, list(seeds[i % 4])) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in sim.pq_codes(df).collect()}
    assert len(out) == 8
    for i in range(4):
        r = out[10 + i]
        assert (
            r["code_0"] == r["code_1"] == r["code_2"] == r["code_3"] == i % 4
        ), r
    # seeds map to themselves
    for i in range(4):
        r = out[i]
        assert r["code_0"] == r["code_1"] == r["code_2"] == r["code_3"] == i


def test_chunk_documents_overlap_and_coverage(spark):
    # 100 tokens -> starts 0, 48, 96: chunks clamp at the doc tail
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = tx.chunk_documents(df, chunk_size=64, stride=48)
    rows = {r["chunk_idx"]: r for r in out.collect()}
    assert sorted(rows) == [0, 1, 2]
    assert [rows[i]["start_tok"] for i in range(3)] == [0, 48, 96]
    assert [rows[i]["n_tok"] for i in range(3)] == [64, 52, 4]
    # consecutive full chunks share chunk_size - stride = 16 tokens
    c0 = rows[0]["chunk_text"].split(" ")
    c1 = rows[1]["chunk_text"].split(" ")
    assert c0[48:] == c1[:16]
    # every token is covered: union of chunks == original token set
    covered = set()
    for r in rows.values():
        covered.update(r["chunk_text"].split(" "))
    assert covered == set(text.split(" "))


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(7, "only four tokens here")], "doc_id long, text string")
    out = tx.chunk_documents(df).collect()
    assert len(out) == 1
    assert out[0]["n_tok"] == 4 and out[0]["chunk_text"] == "only four tokens here"


def test_resize_nearest_ppm_exact():
    # 2x2 RGB -> 4x4: nearest-neighbor must replicate each source
    # pixel into a 2x2 block, exactly
    import numpy as np

    src = _ppm_bytes(2, 2, range(12))
    r = mm.resize_nearest(src, 4, 4)
    assert (r["width"], r["height"], r["channels"]) == (4, 4, 3)
    out = np.frombuffer(r["pixels"], np.uint8).reshape(4, 4, 3)
    srcpx = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    assert (out == srcpx.repeat(2, 0).repeat(2, 1)).all()
    # downscale back: picks the top-left of each block
    r2 = mm.resize_nearest(_ppm_bytes(2, 2, range(12)), 1, 1)
    assert np.frombuffer(r2["pixels"], np.uint8).tolist() == [0, 1, 2]


def test_resize_nearest_bmp_row_order():
    # BMP rows are stored bottom-up; resize must see top-down pixels:
    # a 1x2 image (top=10, bottom=200) downsized to 1x1 keeps the TOP
    import numpy as np

    bmp = _bmp_bytes(1, 2, [[200, 200, 200], [10, 10, 10]])
    r = mm.resize_nearest(bmp, 1, 1)
    assert np.frombuffer(r["pixels"], np.uint8).tolist() == [10, 10, 10]


def test_resize_images_through_spark(spark):
    ppm = _ppm_bytes(2, 2, range(12))
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = mm.resize_images(df, 4, 4).collect()
    # unrecognized payload dropped, raster resized
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["width"] == 4 and len(bytes(rows[0]["pixels"])) == 48


def test_cluster_verified_pairs_matches_expression_form(spark):
    """The numpy cluster kernel must equal the F.aggregate fold
    expression form bit-for-bit (cumsum sequential accumulation)."""
    import math

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.2, 0.1], 0),
            (1, [0.9, 0.25, 0.05], 0),
            (2, [0.1, 1.0, 0.3], 1),
            (3, [0.12, 0.95, 0.33], 1),
            (4, [0.5, 0.5, 0.5], 1),
        ],
        "vec_id long, embedding array<float>, cid long",
    )
    assign = vecs.select("vec_id", "cid")
    fast = {
        (r["i"], r["j"]): r["cosine"]
        for r in sim.cluster_verified_pairs(
            assign, vecs.drop("cid"), threshold=0.0
        ).collect()
    }
    a = assign.join(
        vecs.select("vec_id", sim.normalize(F.col("embedding")).alias("v")),
        "vec_id",
    )
    b = a.select(
        F.col("vec_id").alias("j"),
        F.col("cid").alias("_cidb"),
        F.col("v").alias("_vj"),
    )
    expr = {
        (r["i"], r["j"]): r["cosine"]
        for r in a.select(
            F.col("vec_id").alias("i"), "cid", F.col("v").alias("_vi")
        )
        .join(b, (F.col("cid") == F.col("_cidb")) & (F.col("i") < F.col("j")))
        .select(
            "i",
            "j",
            F.aggregate(
                F.zip_with(F.col("_vi"), F.col("_vj"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("cosine"),
        )
        .collect()
    }
    assert set(fast) == set(expr) == {(0, 1), (2, 3), (2, 4), (3, 4)}
    for k in expr:
        assert math.isclose(fast[k], expr[k], rel_tol=0.0, abs_tol=0.0), k


def test_decode_image_16bit_ppm():
    # maxval 65535 -> big-endian 2-byte samples; mean over raw sample
    # values; resize declines (8-bit contract) but decode succeeds
    import struct as st

    samples = [0, 1000, 30000, 65535, 12, 7]  # 2x1 RGB
    ppm = b"P6\n2 1\n65535\n" + st.pack(">6H", *samples)
    meta = mm.decode_image(ppm)
    assert (meta["width"], meta["height"], meta["channels"]) == (2, 1, 3)
    assert meta["pixel_mean"] == sum(samples) / 6
    assert mm.resize_nearest(ppm, 1, 1) is None


def _png_bytes(arr, filters=None):
    """Minimal PNG encoder for tests: 8-bit depth, color type from the
    channel count, one IDAT chunk, caller-chosen per-row filter types
    (default 0/None) applied exactly per the spec — so the decoder's
    five unfilter paths are each exercised against ground truth."""
    import struct as st
    import zlib

    import numpy as np

    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    filters = filters or [0] * h
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    recon = np.zeros((h, stride), np.int32)
    for y in range(h):
        recon[y] = flat[y]
        prev = recon[y - 1] if y else np.zeros(stride, np.int32)
        f = filters[y]
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = recon[y][x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            line[x] = (flat[y][x] - pred) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())

    def chunk(typ, data):
        out = st.pack(">I", len(data)) + typ + data
        return out + st.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_all_filter_types():
    import numpy as np

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    # one row per filter type (0..4), row 0 must not be Up-dependent
    png = _png_bytes(arr, filters=[0, 1, 2, 3, 4])
    px = mm._png_pixels(png)
    assert px is not None and px.shape == (5, 4, 3)
    assert (px == arr).all()
    meta = mm.decode_image(png)
    assert meta["width"] == 4 and meta["height"] == 5
    assert meta["channels"] == 3
    assert meta["pixel_mean"] == float(arr.mean())


def test_decode_png_channel_variants_and_resize():
    import numpy as np

    for c in (1, 2, 4):
        arr = np.arange(2 * 3 * c, dtype=np.uint8).reshape(2, 3, c)
        meta = mm.decode_image(_png_bytes(arr, filters=[4, 1]))
        assert (meta["height"], meta["width"], meta["channels"]) == (2, 3, c)
    # resize path reads PNG pixels top-down like PPM
    arr = np.zeros((2, 2, 3), np.uint8)
    arr[0] = 200  # top row bright
    r = mm.resize_nearest(_png_bytes(arr), 1, 1)
    assert r is not None and r["pixels"][0] == 200


def test_decode_png_rejects_unsupported():
    import struct as st
    import zlib

    import numpy as np

    arr = np.zeros((2, 2, 3), np.uint8)
    good = _png_bytes(arr)
    assert mm.decode_image(good) is not None
    # corrupt zlib stream
    bad = good.replace(b"IDAT", b"IDAt")
    assert mm.decode_image(bad) is None
    # interlaced: flip the interlace byte inside IHDR (offset: sig 8 +
    # len 4 + type 4 + 12-byte prefix of the 13-byte IHDR payload)
    interlaced = bytearray(good)
    interlaced[8 + 8 + 12] = 1
    assert mm.decode_image(bytes(interlaced)) is None
    # truncated mid-chunk
    assert mm.decode_image(good[: len(good) - 20]) is None


def test_multimodal_png_through_spark(spark):
    """extract_image_meta on REAL PNG bytes end-to-end (r4 verdict #6):
    mixed corpus of PNG / PPM / unrecognized payloads through the
    mapInPandas decode stage, every row decoded by the right kernel."""
    import numpy as np

    arr = np.full((3, 2, 3), 10, np.uint8)
    png = _png_bytes(arr, filters=[0, 2, 1])
    ppm = _ppm_bytes(2, 2, range(12))
    rows = [(1, bytearray(png)), (2, bytearray(ppm)), (3, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in mm.extract_image_meta(df).collect()
    }
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (2, 3, 3)
    assert got[1]["pixel_mean"] == 10.0
    assert got[2]["width"] == 2 and got[2]["channels"] == 3
    # unrecognized falls back to the deterministic fake, same schema
    assert got[3]["n_bytes"] == len(b"not an image")


def test_containment_catches_embedded_doc(spark):
    """A short doc fully embedded in a long one: containment fires at
    1.0 while Jaccard stays far below any dedup threshold — the case
    the asymmetric measure exists for."""
    from lms_erp_data_integration_spark.operators import dedup as dd

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, short + " " + filler)], "doc_id long, text string"
    )
    rows = dd.ngram_containment_duplicates(docs, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["i"], r["j"]) == (1, 2)
    assert r["containment"] == 1.0
    assert r["jaccard"] < 0.5
    # and the symmetric form indeed misses it at its threshold
    assert dd.ngram_jaccard_duplicates(docs, threshold=0.8).count() == 0


# ------------------------------------------------- r5: span dedup, winnowing


def test_duplicate_span_stats_planted_copy(spark):
    from lms_erp_data_integration_spark.operators.dedup import (
        duplicate_span_stats,
    )

    base = " ".join(f"w{i}" for i in range(20))
    other = " ".join(f"x{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r for r in duplicate_span_stats(df, span_tokens=8).collect()
    }
    # docs 1 and 2 are identical: all 13 distinct 8-token spans duplicated
    assert set(rows) == {1, 2}
    for d in (1, 2):
        assert rows[d]["n_spans"] == 13
        assert rows[d]["n_dup_spans"] == 13


def test_duplicate_span_stats_partial_overlap(spark):
    from lms_erp_data_integration_spark.operators.dedup import (
        duplicate_span_stats,
    )

    shared = " ".join(f"s{i}" for i in range(10))  # 10 shared tokens
    a = shared + " " + " ".join(f"a{i}" for i in range(10))
    b = shared + " " + " ".join(f"b{i}" for i in range(10))
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r for r in duplicate_span_stats(df, span_tokens=8).collect()
    }
    # only spans fully inside the shared 10-token prefix are duplicated:
    # 10 - 8 + 1 = 3 of each doc's 13 spans
    assert rows[1]["n_spans"] == 13 and rows[1]["n_dup_spans"] == 3
    assert rows[2]["n_dup_spans"] == 3


def test_winnow_fingerprints_density_and_no_miss(spark):
    from lms_erp_data_integration_spark.operators.dedup import (
        winnow_fingerprints,
    )

    import random

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(50)]
    shared_run = " ".join(f"r{i}" for i in range(6))  # window+n-1 = 6 words

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    d1 = doc(40) + " " + shared_run + " " + doc(40)
    d2 = doc(30) + " " + shared_run + " " + doc(30)
    df = spark.createDataFrame([(1, d1), (2, d2)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in winnow_fingerprints(df).collect()}
    # winnowing guarantee: any shared run of window + shingle_n - 1 = 6
    # words shares at least one selected fingerprint
    assert set(out[1]["fingerprint"]) & set(out[2]["fingerprint"])
    for r in out.values():
        # density: selected count is well below the k-gram count and at
        # least the 1/window floor
        assert r["n_kgrams"] // 4 <= len(r["fingerprint"]) < r["n_kgrams"]


def test_winnow_fingerprints_short_doc_dropped(spark):
    from lms_erp_data_integration_spark.operators.dedup import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e f g")], ["doc_id", "text"]
    )
    # doc 1 has 3 k-grams (< window=4) -> dropped; doc 2 has 5 -> kept
    out = {r["doc_id"] for r in winnow_fingerprints(df).collect()}
    assert out == {2}


# ------------------------------------------------- r5: baseline JPEG codec


def test_jpeg_round_trip_gray_exact_on_solid():
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((16, 16), 128, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (16, 16, 1)
    assert int(np.abs(out[..., 0].astype(int) - 128).max()) == 0


def test_jpeg_round_trip_rgb_gradient_tight():
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.zeros((40, 56, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, 56)[None, :]
    img[..., 1] = np.linspace(0, 255, 40)[:, None]
    img[..., 2] = 77
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_jpeg_subsampled_with_restart_markers():
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    # smooth image: 4:2:0 + DRI must still reconstruct closely; odd
    # dimensions exercise the crop of padded MCUs
    img = np.zeros((33, 41, 3), np.uint8)
    img[..., 0] = np.linspace(10, 240, 41)[None, :]
    img[..., 1] = np.linspace(240, 10, 33)[:, None]
    img[..., 2] = 128
    b = encode_jpeg(img, quality=92, subsample=True, restart_interval=2)
    assert b.count(b"\xff\xdd") == 1  # DRI present
    out = decode_jpeg(b)
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 8


def test_jpeg_noise_luma_preserved_q85():
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85))
    err = np.abs(out[..., 0].astype(int) - img.astype(int))
    assert err.mean() < 8  # quantization loss only, no structural error


def test_jpeg_rejects_non_jpeg_and_truncated():
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\x89PNG\r\n\x1a\nrest") is None
    b = encode_jpeg(np.full((8, 8), 10, np.uint8))
    assert decode_jpeg(b[:40]) is None  # truncated mid-header
    # truncated mid-entropy-data must never raise (None or partial ok)
    out = decode_jpeg(b[:-10])
    assert out is None or out.shape == (8, 8, 1)


def test_decode_image_routes_jpeg():
    import numpy as np

    from lms_erp_data_integration_spark.operators import multimodal as mm
    from lms_erp_data_integration_spark.operators.jpeg import encode_jpeg

    img = np.full((12, 9, 3), 200, np.uint8)
    meta = mm.decode_image(encode_jpeg(img, quality=95))
    assert meta is not None
    assert (meta["width"], meta["height"], meta["channels"]) == (9, 12, 3)
    assert abs(meta["pixel_mean"] - 200.0) < 2.0


def test_resize_nearest_jpeg_payload():
    import numpy as np

    from lms_erp_data_integration_spark.operators import multimodal as mm
    from lms_erp_data_integration_spark.operators.jpeg import encode_jpeg

    img = np.zeros((16, 16, 3), np.uint8)
    img[:8] = 50
    img[8:] = 180
    r = mm.resize_nearest(encode_jpeg(img, quality=95), 4, 4)
    assert r is not None
    assert (r["width"], r["height"], r["channels"]) == (4, 4, 3)
    px = np.frombuffer(r["pixels"], np.uint8).reshape(4, 4, 3)
    assert abs(int(px[0, 0, 0]) - 50) <= 4
    assert abs(int(px[3, 0, 0]) - 180) <= 4


def test_multimodal_jpeg_through_spark(spark):
    """extract_image_meta on REAL baseline-JPEG bytes end-to-end:
    mixed JPEG / PPM / unrecognized corpus through the mapInPandas
    decode stage — the compressed-codec gap from the r4 verdict,
    closed by operators/jpeg.py."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import encode_jpeg

    img = np.full((6, 4, 3), 90, np.uint8)
    jpg = encode_jpeg(img, quality=95)
    ppm = _ppm_bytes(2, 2, range(12))
    rows = [(1, bytearray(jpg)), (2, bytearray(ppm)), (3, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.extract_image_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (4, 6, 3)
    assert abs(got[1]["pixel_mean"] - 90.0) < 2.0
    assert got[2]["width"] == 2
    assert got[3]["n_bytes"] == len(b"not an image")


def test_transcode_images_normalizes_mixed_corpus(spark):
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    big_ppm = _ppm_bytes(8, 8, [100] * (8 * 8 * 3))
    jpg = encode_jpeg(np.full((20, 30, 3), 60, np.uint8), quality=95)
    rows = [(1, bytearray(big_ppm)), (2, bytearray(jpg)), (3, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in mm.transcode_images(df, 16, 16, quality=92).collect()
    }
    assert set(out) == {1, 2}  # junk dropped
    for r in out.values():
        px = decode_jpeg(bytes(r["payload"]))
        assert px.shape == (16, 16, 3)
    # solid-color inputs survive the round trip near-exactly
    px1 = decode_jpeg(bytes(out[1]["payload"]))
    assert abs(int(px1[..., 0].mean()) - 100) <= 2


def _wav_bytes(rate=8000, channels=1, bits=16, samples=None):
    import struct as st

    if samples is None:
        samples = [0, 16384, 0, -16384] * 100
    if bits == 16:
        data = b"".join(st.pack("<h", s) for s in samples)
    else:
        data = bytes((s // 256) + 128 for s in samples)
    balign = channels * bits // 8
    fmt = st.pack("<HHIIHH", 1, channels, rate, rate * balign, balign, bits)
    body = b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", len(data)) + data
    return b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_wav_pcm16():
    w = _wav_bytes()
    meta = mm.decode_wav(w)
    assert meta["sample_rate"] == 8000 and meta["channels"] == 1
    assert meta["n_samples"] == 400
    assert meta["duration_ms"] == 400 * 1000 // 8000
    # square-ish wave at half amplitude: RMS = 0.5 / sqrt(2) ~ 0.3536
    assert abs(meta["rms_milli"] - 353) <= 1


def test_decode_wav_rejects_non_wav():
    assert mm.decode_wav(b"not audio") is None
    assert mm.decode_wav(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    # float PCM (format 3) is not supported -> None, not garbage
    w = bytearray(_wav_bytes())
    w[20] = 3
    assert mm.decode_wav(bytes(w)) is None


def test_extract_audio_meta_mixed(spark):
    rows = [(1, bytearray(_wav_bytes())), (2, b"not audio")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.extract_audio_meta(df).collect()}
    assert got[1]["sample_rate"] == 8000 and got[1]["rms_milli"] is not None
    assert got[2]["sample_rate"] is None  # dead-letter row, byte count kept
    assert got[2]["n_bytes"] == len(b"not audio")


def test_encode_png_lossless_round_trip():
    import numpy as np

    rng = np.random.default_rng(3)
    for shape in [(5, 7), (4, 4, 2), (6, 3, 3), (2, 9, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = mm._png_pixels(mm.encode_png(img))
        ref = img[..., None] if img.ndim == 2 else img
        assert out is not None and (out == ref).all()
    # and through the metadata decoder
    img = np.full((3, 5, 3), 42, np.uint8)
    meta = mm.decode_image(mm.encode_png(img))
    assert (meta["width"], meta["height"], meta["channels"]) == (5, 3, 3)
    assert meta["pixel_mean"] == 42.0


def test_jpeg_progressive_bit_identical_to_sequential():
    """Entropy coding is lossless, so progressive (SOF2: DC/AC first +
    refinement scans, spectral bands, successive approximation) must
    reconstruct EXACTLY the same pixels as sequential coding of the
    same quantized blocks — one equality over every scan-kind branch."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [
        (np.full((16, 16), 128, np.uint8), {}),
        (rng.integers(0, 256, (17, 23), dtype=np.uint8), {}),
        (rng.integers(0, 256, (12, 20, 3), dtype=np.uint8), {}),
        (rng.integers(0, 256, (33, 41, 3), dtype=np.uint8),
         {"subsample": True}),
    ]
    for img, kw in cases:
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=90, **kw))
        seq = decode_jpeg(encode_jpeg(img, quality=90, **kw))
        assert prog is not None
        assert (prog == seq).all()


def test_jpeg_arithmetic_bit_identical_to_huffman():
    """SOF9 arithmetic coding is a lossless entropy layer over the
    same quantized blocks, so decode must be EXACTLY the Huffman
    process's pixels — across gray/color, 4:2:0, restart intervals,
    RGB-in-JPEG, and non-default DAC conditioning."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_arith,
    )

    rng = np.random.default_rng(17)
    cases = [
        (np.full((16, 16), 128, np.uint8), {}, {}),
        (rng.integers(0, 256, (17, 23), dtype=np.uint8), {}, {}),
        (rng.integers(0, 256, (12, 20, 3), dtype=np.uint8),
         {"restart_interval": 2}, {"restart_interval": 2}),
        (rng.integers(0, 256, (33, 41, 3), dtype=np.uint8),
         {"subsample": True}, {"subsample": True}),
        (rng.integers(0, 256, (9, 14, 3), dtype=np.uint8),
         {"rgb": True}, {"rgb": True}),
        (rng.integers(0, 256, (24, 8, 3), dtype=np.uint8),
         {"dc_cond": (2, 4), "ac_kx": 30}, {}),
    ]
    for img, akw, hkw in cases:
        pa = encode_jpeg_arith(img, quality=90, **akw)
        assert b"\xff\xc9" in pa and b"\xff\xcc" in pa  # SOF9 + DAC
        arith = decode_jpeg(pa)
        huff = decode_jpeg(encode_jpeg(img, quality=90, **hkw))
        assert arith is not None
        assert (arith == huff).all()
    # arithmetic is the compact process: adaptive contexts beat the
    # fixture encoder's flat Huffman tables on every case above
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(encode_jpeg_arith(img)) < len(encode_jpeg(img))


def test_jpeg_arith_progressive_bit_identical_to_huffman_progressive():
    """SOF10 (progressive, arithmetic) is a lossless entropy layer
    over the same quantized blocks and the same Annex-G scan script
    as the SOF2 fixture encoder, so decode must be EXACTLY the
    Huffman progressive pixels — gray/color, 4:2:0, non-default DAC
    conditioning, single-MCU and multi-MCU shapes."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_arith_progressive,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(23)
    cases = [
        (np.full((16, 16), 128, np.uint8), {}),
        (rng.integers(0, 256, (17, 23), dtype=np.uint8), {}),
        (rng.integers(0, 256, (12, 20, 3), dtype=np.uint8), {}),
        (rng.integers(0, 256, (33, 41, 3), dtype=np.uint8),
         {"subsample": True}),
        (rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), {}),
        (rng.integers(0, 256, (24, 9, 3), dtype=np.uint8),
         {"dc_cond": (2, 4), "ac_kx": 30}),
    ]
    for img, akw in cases:
        hkw = {k: v for k, v in akw.items() if k == "subsample"}
        pa = encode_jpeg_arith_progressive(img, quality=90, **akw)
        assert b"\xff\xca" in pa and b"\xff\xcc" in pa  # SOF10 + DAC
        arith = decode_jpeg(pa)
        huff = decode_jpeg(encode_jpeg_progressive(img, quality=90, **hkw))
        assert arith is not None
        assert (arith == huff).all()
    # the adaptive QM layer beats the flat-table Huffman fixture
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(encode_jpeg_arith_progressive(img)) < len(
        encode_jpeg_progressive(img)
    )


def test_jpeg12_extended_sequential_roundtrip():
    """12-bit SOF1: uint16 rasters survive an encode/decode round
    trip with only DCT rounding error at quality 100 (unit quant
    tables), across gray/RGB and restart intervals; the 8-bit
    dispatcher refuses the stream, and decode_jpeg12 refuses 8-bit
    and lossless streams."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg12,
        encode_jpeg,
        encode_jpeg12,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(31)
    for shape, ri in [((24, 17), 0), ((16, 16, 3), 0), ((21, 34, 3), 3)]:
        img = rng.integers(0, 4096, shape, dtype=np.uint16)
        p = encode_jpeg12(img, quality=100, restart_interval=ri)
        assert b"\xff\xc1" in p  # SOF1
        assert p[p.index(b"\xff\xdb") + 4] & 0xF0 == 0x10  # Pq = 1
        d = decode_jpeg12(p)
        assert d is not None and d.dtype == np.uint16
        src = img if img.ndim == 3 else img[:, :, None]
        assert d.shape == src.shape
        # quality 100 -> unit quant tables: only FDCT/IDCT rounding
        assert np.abs(d.astype(int) - src.astype(int)).max() <= 4
        assert decode_jpeg(p) is None  # not an 8-bit raster
    img8 = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    assert decode_jpeg12(encode_jpeg(img8)) is None
    assert decode_jpeg12(encode_jpeg_lossless(img8)) is None
    # malformed inputs reject cleanly
    p = encode_jpeg12(rng.integers(0, 4096, (12, 10), dtype=np.uint16))
    for cut in range(0, len(p), 11):
        r = decode_jpeg12(p[:cut])
        assert r is None or r.shape == (12, 10, 1)


def test_jpegls_lossless_roundtrip():
    """JPEG-LS (T.87): bit-exact encode/decode round trips through
    regular mode, run mode (including exact end-of-line segment
    fits), the bias-inverted k=0 mapping, 8- and 16-bit precision,
    gray/RGB plane scans, and a non-default RESET via LSE; the
    shared dispatcher recognizes 8-bit streams structurally (not by
    substring) and the 8-bit raster contract excludes deep planes."""
    import numpy as np

    from lms_erp_data_integration_spark.operators import multimodal as mm
    from lms_erp_data_integration_spark.operators.jpegls import (
        decode_jpegls,
        encode_jpegls,
        is_jpegls,
    )

    rng = np.random.default_rng(53)
    cases = [
        rng.integers(0, 256, (13, 9), dtype=np.uint8),
        rng.integers(0, 256, (7, 21, 3), dtype=np.uint8),
        np.zeros((20, 30), np.uint8),  # pure runs, EOL segments
        np.full((5, 64), 77, np.uint8),  # exact segment fits
        np.cumsum(rng.integers(0, 3, (9, 29, 3)), axis=1).astype(np.uint8),
        rng.integers(0, 65536, (8, 11), dtype=np.uint16),
        np.eye(16, dtype=np.uint8) * 255,  # run interruptions
    ]
    for i, img in enumerate(cases):
        p = encode_jpegls(img, reset=32 if i == 4 else 64)
        assert is_jpegls(p) and p[2:4] == b"\xff\xf7"
        d = decode_jpegls(p)
        src = img if img.ndim == 3 else img[:, :, None]
        assert d is not None and d.shape == src.shape and (d == src).all()
    p8 = encode_jpegls(cases[0])
    assert (mm._decode_pixels(p8) == cases[0][:, :, None]).all()
    meta = mm.decode_image(p8)
    assert (meta["width"], meta["height"]) == (9, 13)
    p16 = encode_jpegls(cases[5])
    assert mm._decode_pixels(p16) is None  # deep raster excluded
    assert decode_jpegls(p16).dtype == np.uint16
    # an ordinary JPEG is not structurally JPEG-LS, and vice versa
    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    assert not is_jpegls(encode_jpeg(cases[1]))
    assert decode_jpeg(p8) is None
    # truncation / corruption reject cleanly
    for cut in range(0, len(p8), 7):
        r = decode_jpegls(p8[:cut])
        assert r is None or r.shape == (13, 9, 1)
    for _ in range(60):
        mut = bytearray(p8)
        mut[int(rng.integers(2, len(mut)))] ^= int(rng.integers(1, 256))
        r = decode_jpegls(bytes(mut))
        assert r is None or r.dtype in (np.uint8, np.uint16)


def test_qoi_roundtrip_all_ops():
    """QOI encode/decode is lossless across inputs that force every
    chunk op (RUN, INDEX, DIFF, LUMA, RGB, RGBA); the shared pixel
    dispatcher and metadata prober both recognize the format; and
    truncation/corruption rejects cleanly."""
    import numpy as np

    from lms_erp_data_integration_spark.operators import multimodal as mm
    from lms_erp_data_integration_spark.operators.qoi import (
        decode_qoi,
        encode_qoi,
    )

    rng = np.random.default_rng(41)
    cases = [
        rng.integers(0, 256, (13, 9, 3), dtype=np.uint8),
        rng.integers(0, 256, (7, 21, 4), dtype=np.uint8),
        np.zeros((50, 40, 3), np.uint8),  # >62-long runs
        (rng.integers(0, 3, (31, 17, 3)) * 100).astype(np.uint8),  # INDEX
        np.cumsum(
            rng.integers(0, 3, (9, 9, 3)), axis=1
        ).astype(np.uint8),  # DIFF/LUMA
    ]
    for img in cases:
        p = encode_qoi(img)
        assert p[:4] == b"qoif" and p[-8:] == b"\x00" * 7 + b"\x01"
        d = decode_qoi(p)
        assert d is not None and d.shape == img.shape and (d == img).all()
        px = mm._decode_pixels(p)
        assert px is not None and (px == img).all()
        meta = mm.decode_image(p)
        assert meta["width"] == img.shape[1]
        assert meta["channels"] == img.shape[2]
    # a leading RUN chunk must still seed the index slot for
    # (0,0,0,255) the way qoi.h does
    img = np.zeros((1, 80, 3), np.uint8)
    img[0, 70:] = (10, 20, 30)
    assert (decode_qoi(encode_qoi(img)) == img).all()
    p = encode_qoi(cases[0])
    for cut in range(0, len(p), 5):
        r = decode_qoi(p[:cut])
        assert r is None or r.shape == cases[0].shape
    for _ in range(80):
        mut = bytearray(p)
        mut[int(rng.integers(0, len(mut)))] ^= int(rng.integers(1, 256))
        r = decode_qoi(bytes(mut))
        assert r is None or r.dtype == np.uint8


def test_qm_table_invariants():
    """Table D.3 structure: 113 adaptive states + the fixed bin; all
    transitions in range; MPS-sense switching only on the near-0.5
    states; Qe halving chains stay monotone within each fast-attack
    column start."""
    from lms_erp_data_integration_spark.operators.qm import (
        FIXED_BIN,
        QE_TABLE,
    )

    assert len(QE_TABLE) == 114 and FIXED_BIN == 113
    for qe, nlps, nmps, sw in QE_TABLE:
        assert 0 < qe < 0x8000
        assert 0 <= nlps <= 113 and 0 <= nmps <= 113
        assert sw in (0, 1)
        if sw:
            assert qe > 0x5000  # switching only near p = 0.5
    qe, nlps, nmps, sw = QE_TABLE[FIXED_BIN]
    assert (nlps, nmps, sw) == (113, 113, 0)  # fixed bin never moves
    # MPS adaptation always moves to a smaller-or-near-equal Qe
    for i, (qe, _, nmps, _) in enumerate(QE_TABLE[:113]):
        assert QE_TABLE[nmps][0] <= qe or QE_TABLE[nmps][0] >= 0x5000


def test_jpeg_arithmetic_rejects_corruption_cleanly():
    """Truncations and bit flips of a valid SOF9 stream must decode
    to None or pixels, never raise (same contract as every other
    decoder; the QM decoder feeds zeros past the data end)."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_arith,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    p = encode_jpeg_arith(img, quality=90)
    for cut in range(0, len(p), 7):
        r = decode_jpeg(p[:cut])
        assert r is None or r.shape == (16, 16, 3)
    for _ in range(60):
        mut = bytearray(p)
        mut[int(rng.integers(2, len(mut)))] ^= int(rng.integers(1, 256))
        r = decode_jpeg(bytes(mut))
        assert r is None or r.shape == (16, 16, 3)
    # relabeling the frame SOF10 makes the full-band scan illegal for
    # a progressive frame (B.2.3: DC scan must be Ss=Se=0) -> None
    assert decode_jpeg(p.replace(b"\xff\xc9", b"\xff\xca", 1)) is None
    # arithmetic lossless (SOF11) stays out of scope -> None
    assert decode_jpeg(p.replace(b"\xff\xc9", b"\xff\xcb", 1)) is None


def test_jpeg_lossless_exact_all_predictors():
    """SOF3 lossless JPEG: bit-exact round-trip through every
    predictor selector, gray and RGB, plus the point-transform and
    deep-precision (12/16-bit) paths."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_lossless16,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (9, 21), dtype=np.uint8)
    for sel in range(1, 8):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(img, predictor=sel)), img
        )
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(gray, predictor=sel))[..., 0],
            gray,
        )
    # point transform drops Pt low bits, recovers (x >> Pt) << Pt
    p = encode_jpeg_lossless(img, predictor=4, point_transform=3)
    assert np.array_equal(decode_jpeg(p), (img >> 3) << 3)
    # deep precision: 8-bit dispatcher refuses, 16-bit entry is exact
    img12 = rng.integers(0, 4096, (8, 11, 3), dtype=np.uint16)
    p12 = encode_jpeg_lossless(img12, predictor=7, precision=12)
    assert decode_jpeg(p12) is None
    assert np.array_equal(decode_jpeg_lossless16(p12), img12)
    img16 = rng.integers(0, 65536, (6, 7), dtype=np.uint16)
    p16 = encode_jpeg_lossless(img16, predictor=2)
    assert np.array_equal(decode_jpeg_lossless16(p16)[..., 0], img16)
    # the 16-bit entry also upcasts 8-bit lossless frames
    assert np.array_equal(
        decode_jpeg_lossless16(encode_jpeg_lossless(gray))[..., 0],
        gray.astype(np.uint16),
    )
    # and refuses DCT frames outright
    from lms_erp_data_integration_spark.operators.jpeg import encode_jpeg

    assert decode_jpeg_lossless16(encode_jpeg(img)) is None


def test_jpeg_lossless_rejects_corruption_cleanly():
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(37)
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    p = encode_jpeg_lossless(img, predictor=5)
    for cut in range(0, len(p), 5):
        r = decode_jpeg(p[:cut])
        assert r is None or r.shape == (10, 12, 3)
    for _ in range(50):
        mut = bytearray(p)
        mut[int(rng.integers(2, len(mut)))] ^= int(rng.integers(1, 256))
        r = decode_jpeg(bytes(mut))
        assert r is None or r.shape == (10, 12, 3)


def test_multimodal_dispatches_arithmetic_jpeg(spark):
    """jpeg_arith payloads flow through the SAME public dispatcher
    (decode_image / _decode_pixels) as every other raster format."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_arith,
    )

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    p = encode_jpeg_arith(img, quality=92)
    meta = mm.decode_image(p)
    assert meta is not None and (meta["width"], meta["height"]) == (13, 11)
    px = mm._decode_pixels(p)
    assert np.array_equal(px, decode_jpeg(p))


def test_jpeg_progressive_marker_and_quality():
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    img = np.zeros((24, 24, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, 24)[None, :]
    img[..., 1] = 100
    img[..., 2] = np.linspace(255, 0, 24)[:, None]
    b = encode_jpeg_progressive(img, quality=95)
    assert b"\xff\xc2" in b and b.count(b"\xff\xda") == 10  # SOF2, 10 scans
    out = decode_jpeg(b)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4


def test_multimodal_progressive_jpeg_through_spark(spark):
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    img = np.full((10, 6, 3), 120, np.uint8)
    rows = [(1, bytearray(encode_jpeg_progressive(img, quality=95)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = mm.extract_image_meta(df).collect()[0]
    assert (got["width"], got["height"], got["channels"]) == (6, 10, 3)
    assert abs(got["pixel_mean"] - 120.0) < 2.0


# ------------------------------------------------------ r5: GIF codec


def test_gif_round_trip_all_modes():
    import numpy as np

    from lms_erp_data_integration_spark.operators.gif import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (13, 17))
    for interlace in (False, True):
        for compress in (False, True):
            out = decode_gif(
                encode_gif(idx, pal, interlace=interlace, compress=compress)
            )
            assert out is not None and (out == pal[idx]).all()


def test_gif_lzw_width_growth_and_runs():
    import numpy as np

    from lms_erp_data_integration_spark.operators.gif import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(9)
    # 256-entry palette + big noisy frame: code width grows past 9 bits
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (60, 70))
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()
    # constant run: dictionary chains + the KwKwK code path
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    run = np.zeros((50, 60), np.int64)
    assert (decode_gif(encode_gif(run, pal2)) == pal2[run]).all()


def test_gif_rejects_non_gif():
    from lms_erp_data_integration_spark.operators.gif import decode_gif

    assert decode_gif(b"") is None
    assert decode_gif(b"not a gif") is None
    assert decode_gif(b"GIF89a" + b"\x00" * 5) is None


_REAL_GIF_DIR = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
    "python3.11/idlelib/Icons"
)


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REAL_GIF_DIR),
    reason="no real-encoder GIF corpus on this host",
)
def test_gif_decodes_real_encoder_output():
    """Files written by real GIF encoders (IDLE's icon set) pin the
    LZW width-growth rule: a wrong rule desyncs within a few codes and
    cannot produce full frames."""
    import glob
    import os

    from lms_erp_data_integration_spark.operators.gif import decode_gif

    files = sorted(glob.glob(os.path.join(_REAL_GIF_DIR, "*.gif")))
    assert len(files) >= 5
    for f in files:
        out = decode_gif(open(f, "rb").read())
        assert out is not None and out.ndim == 3 and out.shape[2] == 3


def test_decode_image_routes_gif():
    import numpy as np

    from lms_erp_data_integration_spark.operators.gif import encode_gif

    pal = np.array([[10, 20, 30], [200, 210, 220]], np.uint8)
    idx = np.tile(np.array([[0, 1]]), (4, 3))  # 4x6 checkerboard-ish
    meta = mm.decode_image(encode_gif(idx, pal))
    assert (meta["width"], meta["height"], meta["channels"]) == (6, 4, 3)


def test_tiff_round_trip_and_routing():
    import numpy as np

    rng = np.random.default_rng(7)
    for be in (False, True):
        for pb in (False, True):
            img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
            t = mm.encode_tiff(img, big_endian=be, packbits=pb)
            out = mm._decode_tiff_pixels(t)
            assert out is not None and (out == img).all()
    gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    meta = mm.decode_image(mm.encode_tiff(gray))
    assert (meta["width"], meta["height"], meta["channels"]) == (11, 9, 1)
    r = mm.resize_nearest(mm.encode_tiff(gray), 4, 4)
    assert r is not None and (r["width"], r["height"]) == (4, 4)
    assert mm._decode_tiff_pixels(b"II\x2b\x00junk") is None
    # 16-bit/LZW TIFFs must be rejected, not mis-decoded: flip the
    # compression tag to LZW (5)
    t = bytearray(mm.encode_tiff(gray))
    # find compression tag 259 in IFD and set value to 5
    import struct as st
    n = st.unpack_from("<H", t, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if st.unpack_from("<H", t, off)[0] == 259:
            st.pack_into("<H", t, off + 8, 5)
    assert mm._decode_tiff_pixels(bytes(t)) is None


def test_explode_tar_shards_webdataset(spark):
    """WebDataset shard read path: tar shards explode to member rows;
    groupBy (shard, sample_key) reassembles samples; real image bytes
    inside members decode through the same kernels."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import encode_jpeg

    jpg = encode_jpeg(np.full((4, 4, 3), 50, np.uint8), quality=95)
    shard1 = mm.build_tar_shard(
        [
            ("000001.jpg", jpg),
            ("000001.json", b'{"caption": "a"}'),
            ("000002.jpg", jpg),
            ("000002.json", b'{"caption": "b"}'),
        ]
    )
    shard2 = mm.build_tar_shard([("000003.txt", b"doc")], gzipped=True)
    df = spark.createDataFrame(
        [(1, bytearray(shard1)), (2, bytearray(shard2)), (3, b"junk")],
        "doc_id long, payload binary",
    )
    members = mm.explode_tar_shards(df)
    rows = members.collect()
    assert len(rows) == 5  # junk shard contributes nothing
    samples = {
        (r["shard_id"], r["sample_key"]): r["cnt"]
        for r in members.groupBy("shard_id", "sample_key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert samples == {(1, "000001"): 2, (1, "000002"): 2, (2, "000003"): 1}
    # member image bytes decode through the standard kernel chain
    imgs = mm.extract_image_meta(
        members.where(F.col("member_ext") == "jpg").select(
            F.col("sample_key").cast("long").alias("doc_id"), "payload"
        )
    ).collect()
    assert {r["width"] for r in imgs} == {4}


def test_wav_spectral_features_sine():
    import math
    import struct as st

    import numpy as np

    # 440 Hz sine at 8 kHz for 1 s
    rate, hz = 8000, 440.0
    samples = [
        int(20000 * math.sin(2 * math.pi * hz * t / rate))
        for t in range(rate)
    ]
    w = _wav_bytes(rate=rate, channels=1, bits=16, samples=samples)
    f = mm.wav_spectral_features(w)
    assert f is not None
    assert abs(f["dominant_hz"] - hz) <= 1.0  # 1 Hz bins at 1 s window
    assert abs(f["spectral_centroid_hz"] - hz) <= 40.0  # leakage spread
    assert mm.wav_spectral_features(b"not audio") is None


def test_extract_audio_spectral_through_spark(spark):
    rows = [(1, bytearray(_wav_bytes())), (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = mm.extract_audio_spectral(df).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 1
    # the square-ish test wave alternates at rate/4 = 2 kHz
    assert abs(got[0]["dominant_hz"] - 2000.0) < 50.0


def _mp4_bytes(duration_s=7, scale=1000, w=640, h=360):
    """Minimal hand-built ISO BMFF: ftyp + moov(mvhd + trak(tkhd))."""
    def box(typ, body):
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    mvhd = box(
        b"mvhd",
        bytes(4)  # version+flags
        + bytes(8)  # ctime/mtime
        + scale.to_bytes(4, "big")
        + (duration_s * scale).to_bytes(4, "big")
        + bytes(80),
    )
    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(8) + (1).to_bytes(4, "big") + bytes(4)
        + bytes(4)  # duration
        + bytes(52)  # reserved/matrix
        + (w << 16).to_bytes(4, "big")
        + (h << 16).to_bytes(4, "big"),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


def test_probe_mp4_structure():
    meta = mm.probe_mp4(_mp4_bytes())
    assert meta is not None
    assert meta["brand"] == "isom"
    assert meta["duration_ms"] == 7000
    assert meta["n_tracks"] == 1
    assert (meta["width"], meta["height"]) == (640, 360)
    assert mm.probe_mp4(b"not a video") is None
    assert mm.probe_mp4(_mp4_bytes()[:20]) is None  # moov truncated away


# --------------------------------------------- r5: web-corpus curation


def test_html_to_text_and_link_density(spark):
    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><!-- c --><h1>Header</h1><p>Hello &amp; welcome to "
        "<b>the</b> page.</p><script>var x = \"<p>not text</p>\";"
        "</script><div><a href='/x'>a link</a> and text</div></body></html>"
    )
    nav = (
        "<body><ul>"
        + "".join(f"<li><a href='/{i}'>item {i}</a></li>" for i in range(8))
        + "</ul></body>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, nav)], "id long, html string"
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            tx.html_to_text(F.col("html")).alias("text"),
            *[
                c.alias(n)
                for n, c in tx.link_density_exprs(F.col("html")).items()
            ],
        ).collect()
    }
    t = out[1]["text"]
    assert "not text" not in t and "color:red" not in t and "<" not in t
    assert "Hello & welcome to the page." in t
    assert t.startswith("Header")  # block tags became line breaks
    # the nav page is nearly all links; the article page is not
    assert out[2]["link_density"] > 0.8 > out[1]["link_density"]


def test_canonical_url_dedup_key(spark):
    cases = [
        # scheme/case/www/port/tracking/fragment/trailing slash all fold
        ("HTTPS://WWW.Example.com:443/a/b/?utm_source=x&q=1&fbclid=z#f",
         "example.com/a/b?q=1"),
        ("http://example.com/a/b?q=1", "example.com/a/b?q=1"),
        ("example.com/a/b/?q=1&utm_campaign=y", "example.com/a/b?q=1"),
        # param ORDER is preserved (q=1&r=2 != r=2&q=1 keys differently)
        ("http://site.org/?r=2&q=1", "site.org?r=2&q=1"),
        ("http://site.org/", "site.org"),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    bad = df.where(tx.canonical_url(F.col("url")) != F.col("want"))
    rows = bad.select(
        "url", "want", tx.canonical_url(F.col("url")).alias("got")
    ).collect()
    assert not rows, rows


def _mp4_with_samples():
    """ftyp + mdat(5 fake frames) + moov with REAL sample tables:
    sizes [3,4,5,6,7], chunks of 2+3 samples, 40 ms deltas."""
    def box(typ, body):
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    frames = [bytes([0xA0 + i]) * (3 + i) for i in range(5)]
    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big"))
    mdat_body = b"".join(frames)
    mdat_start = len(ftyp) + 8  # frames begin after mdat header
    mdat = box(b"mdat", mdat_body)
    chunk_offsets = [mdat_start, mdat_start + 3 + 4]

    i32 = lambda v: v.to_bytes(4, "big")
    stsz = box(b"stsz", bytes(4) + i32(0) + i32(5)
               + b"".join(i32(3 + i) for i in range(5)))
    stco = box(b"stco", bytes(4) + i32(2)
               + b"".join(i32(o) for o in chunk_offsets))
    stsc = box(b"stsc", bytes(4) + i32(2)
               + i32(1) + i32(2) + i32(1)
               + i32(2) + i32(3) + i32(1))
    stts = box(b"stts", bytes(4) + i32(1) + i32(5) + i32(40))
    stbl = box(b"stbl", stsz + stco + stsc + stts)
    mdhd = box(b"mdhd", bytes(4) + bytes(8) + i32(1000) + i32(200) + bytes(4))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + minf)
    tkhd = box(b"tkhd", bytes(84) + (320 << 16).to_bytes(4, "big")
               + (240 << 16).to_bytes(4, "big"))
    trak = box(b"trak", tkhd + mdia)
    mvhd = box(b"mvhd", bytes(4) + bytes(8) + i32(1000) + i32(200) + bytes(80))
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov, frames


def test_mp4_sample_table_and_frame_extraction(spark):
    payload, frames = _mp4_with_samples()
    table = mm.mp4_sample_table(payload)
    assert table is not None and len(table) == 5
    assert [s["n_bytes"] for s in table] == [3, 4, 5, 6, 7]
    assert [s["dts_ms"] for s in table] == [0, 40, 80, 120, 160]
    # the byte ranges really slice out the frames
    for s, f in zip(table, frames):
        assert payload[s["offset"] : s["offset"] + s["n_bytes"]] == f

    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, b"not video")],
        "doc_id long, payload binary",
    )
    got = mm.extract_video_frames(df, every_n=2).collect()
    assert sorted(r["sample_idx"] for r in got) == [0, 2, 4]
    by_idx = {r["sample_idx"]: bytes(r["frame_bytes"]) for r in got}
    assert by_idx[0] == frames[0] and by_idx[4] == frames[4]


def test_mp4_sample_table_corrupt_counts_reject_fast():
    """Table entry counts are attacker data: a flipped bit in an stsz /
    stco / stsc / stts count (or a huge uniform-stsz sample count) must
    reject, not allocate count-sized lists — the r8 fuzz soak caught a
    single bit flip turning the expansion into a multi-gigabyte
    allocation (an effective hang)."""
    import time

    payload, _ = _mp4_with_samples()
    baseline = mm.mp4_sample_table(payload)
    assert baseline is not None and len(baseline) == 5
    for pattern, count_off in (
        (b"stsz", 8),  # body: version/flags, uniform size, COUNT
        (b"stco", 4),  # body: version/flags, COUNT
        (b"stsc", 4),
        (b"stts", 4),
    ):
        pos = payload.index(pattern) + 4  # start of box body
        for val in (0xFB000000, 0xFFFFFFFF):
            mut = bytearray(payload)
            mut[pos + count_off : pos + count_off + 4] = val.to_bytes(
                4, "big"
            )
            t0 = time.time()
            out = mm.mp4_sample_table(bytes(mut))
            assert time.time() - t0 < 1.0, pattern
            assert out is None, pattern
    # uniform stsz with a bogus huge count: bounded by the stts total
    pos = payload.index(b"stsz") + 4
    mut = bytearray(payload)
    mut[pos + 4 : pos + 8] = (7).to_bytes(4, "big")  # uniform size
    mut[pos + 8 : pos + 12] = (0xFB00000).to_bytes(4, "big")  # count
    t0 = time.time()
    assert mm.mp4_sample_table(bytes(mut)) is None
    assert time.time() - t0 < 1.0


def test_train_bpe_matches_reference(spark):
    """The distributed BPE trainer must learn exactly the merges a
    pure-Python Sennrich reference learns on the classic corpus —
    including the end-of-word marker and the deterministic tie-break."""
    import re as _re
    from collections import Counter

    from lms_erp_data_integration_spark.operators.text import train_bpe

    def ref_bpe(words, n_merges, eow="▁"):
        vocab = Counter(words)
        table = {w: " ".join(list(w)) + " " + eow for w in vocab}
        merges = []
        for _ in range(n_merges):
            counts = Counter()
            for w, n in vocab.items():
                s = table[w].split(" ")
                for a, b in zip(s, s[1:]):
                    counts[(a, b)] += n
            if not counts:
                break
            best = min(
                counts.items(),
                key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]),
            )
            (a, b), c = best
            merges.append((a, b, c))
            pat = _re.compile(
                r"(?<!\S)" + _re.escape(a) + " " + _re.escape(b) + r"(?!\S)"
            )
            for w in table:
                table[w] = pat.sub(a + b, table[w])
        return merges, table

    text = "low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3
    want_merges, want_table = ref_bpe(text.split(), 6)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges, table = train_bpe(df, 6)
    assert merges == want_merges
    got = {r["w"]: r["symbols"] for r in table.collect()}
    assert got == want_table


def test_apply_bpe_round_trips_training_vocab(spark):
    """Encoding the training corpus with the learned merges must
    reproduce the trainer's own final word segmentation (train/apply
    consistency), and unseen words fall back to finer pieces."""
    from lms_erp_data_integration_spark.operators.text import (
        apply_bpe,
        train_bpe,
    )

    text = "low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges, table = train_bpe(df, 6)
    seg = {r["w"]: r["symbols"] for r in table.collect()}

    probe = spark.createDataFrame(
        [(1, "low newest"), (2, "lowest")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in apply_bpe(probe, merges).collect()}
    assert out[1]["tokens"] == seg["low"] + " " + seg["newest"]
    assert out[1]["n_tokens"] == len(out[1]["tokens"].split())
    # "lowest" never seen whole: decomposes into learned subwords
    assert out[2]["tokens"] == "low est▁"


def test_gif_frame_count_multi_frame():
    import numpy as np

    from lms_erp_data_integration_spark.operators.gif import (
        encode_gif,
        gif_frame_count,
    )

    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.zeros((4, 4), np.int64)
    one = encode_gif(idx, pal)
    assert gif_frame_count(one) == 1
    # splice a second frame in before the trailer (animation layout);
    # the global color table is padded to 2^(size_field+1) entries
    body_start = 13 + 3 * (2 << (one[10] & 0x07))
    assert one[body_start] == 0x2C  # image descriptor
    second = one[body_start:-1]  # descriptor..data, minus trailer
    two = one[:-1] + second
    assert gif_frame_count(two) == 2
    assert gif_frame_count(b"nope") is None


def test_bigram_lm_scores_match_hand_model(spark):
    """Tiny corpus with hand-computable probabilities: in-domain text
    scores higher than out-of-domain; exact values match the
    interpolated add-alpha model computed in pure Python."""
    import math

    from lms_erp_data_integration_spark.operators.text import bigram_lm_scores

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zebra quantum flux")],
        "doc_id long, text string",
    )
    lam, alpha = 0.7, 1.0
    # reference model from the training bigrams:
    #   bigrams: (the,cat) x2, (cat,sat), (cat,ran); prefix counts:
    #   the->2, cat->2; vocab(prefixes)=2, total bigrams=4
    bi = {("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1}
    np_ = {"the": 2, "cat": 2}
    vocab, tot = 2, 4

    def logp(p, w):
        nb = bi.get((p, w), 0)
        npre = np_.get(p, 0)
        p_bi = (nb + alpha) / (npre + alpha * vocab)
        p_uni = (np_.get(w, 0) + alpha) / (tot + alpha * vocab)
        return math.log(lam * p_bi + (1 - lam) * p_uni)

    def doc_avg(text):
        ws = text.split()
        micros = [
            math.floor(logp(p, w) * 1_000_000 + 0.5)
            for p, w in zip(ws, ws[1:])
        ]
        return sum(micros) // len(micros), len(micros)

    out = {
        r["doc_id"]: r
        for r in bigram_lm_scores(train, score, lam=lam, alpha=alpha).collect()
    }
    for did, text in [(10, "the cat sat"), (11, "zebra quantum flux")]:
        want_avg, want_n = doc_avg(text)
        assert out[did]["n_bigrams"] == want_n
        assert out[did]["avg_logprob_micro"] == want_avg, (did, text)
    assert out[10]["avg_logprob_micro"] > out[11]["avg_logprob_micro"]


def test_winnow_candidate_pairs_no_miss_and_cap(spark):
    from lms_erp_data_integration_spark.operators.dedup import (
        winnow_candidate_pairs,
    )

    import random

    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(80)]
    shared = " ".join(f"r{i}" for i in range(12))  # long shared run

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    rows = [
        (1, doc(40) + " " + shared + " " + doc(40)),
        (2, doc(35) + " " + shared + " " + doc(35)),
        (3, doc(60)),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["i"], r["j"]): r["shared_fingerprints"]
        for r in winnow_candidate_pairs(df, min_shared=2).collect()
    }
    assert (1, 2) in pairs  # no-miss on the shared run
    assert all(3 not in p for p in pairs)
    # cap: with max_postings=1 every shared fingerprint is "hot"
    assert (
        winnow_candidate_pairs(df, min_shared=1, max_postings=1).count() == 0
    )


def test_png_adam7_interlaced_round_trip():
    import numpy as np

    rng = np.random.default_rng(17)
    # odd sizes exercise partial passes; every channel count
    for shape in [(1, 1), (3, 5), (9, 9, 3), (13, 7, 4), (8, 8, 2)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        b = mm.encode_png(img, interlace=True)
        out = mm._png_pixels(b)
        ref = img[..., None] if img.ndim == 2 else img
        assert out is not None and (out == ref).all(), shape
        # and the plain writer still round-trips the same pixels
        assert (mm._png_pixels(mm.encode_png(img)) == ref).all()


def test_png_palette_resolves_via_plte():
    import struct as st
    import zlib

    import numpy as np

    # hand-build a color-type-3 PNG: 4-entry palette, 3x4 indices
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], np.uint8)
    h, w = idx.shape

    def chunk(typ, body):
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return st.pack(">I", len(body)) + typ + body + st.pack(">I", crc)

    ihdr = st.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    png = (
        mm._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = mm._png_pixels(png)
    assert out is not None and (out == pal[idx]).all()
    meta = mm.decode_image(png)
    assert (meta["width"], meta["height"], meta["channels"]) == (4, 3, 3)
    # out-of-range index -> clean rejection
    bad_idx = idx.copy()
    bad_idx[0, 0] = 200
    scan_bad = b"".join(b"\x00" + bad_idx[y].tobytes() for y in range(h))
    bad = (
        mm._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(scan_bad))
        + chunk(b"IEND", b"")
    )
    assert mm._png_pixels(bad) is None


def test_bmp_pixels_rgb_order_and_palette():
    import struct as st

    import numpy as np

    # 24-bit: one red pixel stored as BGR on disk must come back RGB
    red_bgr = [0, 0, 255]
    bmp24 = _bmp_bytes(1, 1, [red_bgr])
    px = mm._decode_pixels(bmp24)
    assert px.shape == (1, 1, 3) and list(px[0, 0]) == [255, 0, 0]

    # 8-bit palettized: 2x2 indices through a BGRA color table
    pal_rgb = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    table = b"".join(bytes([b, g, r, 0]) for (r, g, b) in pal_rgb)
    idx_rows_bottom_up = [[2, 3], [0, 1]]  # bottom row first on disk
    stride = (2 + 3) & ~3
    data = b"".join(
        bytes(r) + b"\x00" * (stride - 2) for r in idx_rows_bottom_up
    )
    off = 14 + 40 + len(table)
    header = st.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = st.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(data),
                  2835, 2835, len(pal_rgb), 0)
    bmp8 = header + dib + table + data
    px = mm._decode_pixels(bmp8)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == pal_rgb[0]  # top-left = index 0
    assert tuple(px[1, 1]) == pal_rgb[3]
    meta = mm.decode_image(bmp8)
    assert meta["width"] == 2 and meta["height"] == 2


def test_jpeg_exif_orientation():
    import struct as st

    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_oriented,
        encode_jpeg,
        exif_orientation,
    )

    # asymmetric image: bright top-left quadrant
    img = np.zeros((16, 8, 3), np.uint8)
    img[:8, :4] = 250
    plain = encode_jpeg(img, quality=95)
    assert exif_orientation(plain) == 1

    def with_orientation(jpeg_bytes, o):
        tiff = (b"II" + st.pack("<HI", 42, 8)
                + st.pack("<H", 1)
                + st.pack("<HHIHH", 0x0112, 3, 1, o, 0)
                + st.pack("<I", 0))
        app1 = b"Exif\x00\x00" + tiff
        seg = b"\xff\xe1" + st.pack(">H", 2 + len(app1)) + app1
        return jpeg_bytes[:2] + seg + jpeg_bytes[2:]

    # orientation 6 (rotate 90 CW to display): upright form transposes
    rot = with_orientation(plain, 6)
    assert exif_orientation(rot) == 6
    up = decode_jpeg_oriented(rot)
    raw = decode_jpeg(rot)
    assert raw.shape == (16, 8, 3) and up.shape == (8, 16, 3)
    assert (up == raw.transpose(1, 0, 2)[:, ::-1]).all()
    # bright quadrant lands top-RIGHT after 90 CW
    assert up[:4, -4:].mean() > 200 > up[-4:, :4].mean()
    # flip (2) and upside-down (3)
    assert (
        decode_jpeg_oriented(with_orientation(plain, 3))
        == decode_jpeg(plain)[::-1, ::-1]
    ).all()


def test_jpeg_rgb_direct_no_color_transform():
    """Adobe APP14 transform=0 / R,G,B component ids mean the three
    planes are RGB, not YCbCr — converting anyway silently wrecks
    colors. Solid colors round-trip EXACTLY in rgb mode (no transform
    rounding at all)."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 30, 90
    b = encode_jpeg(img, quality=95, rgb=True)
    assert b"Adobe" in b
    out = decode_jpeg(b)
    assert (out == img).all()
    # gradient stays within quantization error, unconverted
    grad = np.zeros((24, 24, 3), np.uint8)
    grad[..., 0] = np.linspace(0, 255, 24)[None, :]
    grad[..., 2] = np.linspace(255, 0, 24)[:, None]
    out2 = decode_jpeg(encode_jpeg(grad, quality=95, rgb=True))
    assert int(np.abs(out2.astype(int) - grad.astype(int)).max()) <= 3


def test_png_16bit_downsamples_to_high_byte():
    import struct as st
    import zlib

    import numpy as np

    # hand-build a 16-bit gray PNG with Sub filtering on row 1
    vals = np.array([[4096, 8192, 65535], [256, 512, 1024]], np.uint16)
    h, w = vals.shape
    row_bytes = [vals[y].astype(">u2").tobytes() for y in range(h)]
    scan = b"\x00" + row_bytes[0]
    # row 1 with filter 1 (Sub, 2-byte distance for 16-bit gray)
    raw1 = np.frombuffer(row_bytes[1], np.uint8).astype(int)
    filt1 = bytearray()
    for x in range(len(raw1)):
        left = raw1[x - 2] if x >= 2 else 0
        filt1.append((raw1[x] - left) & 0xFF)
    scan += b"\x01" + bytes(filt1)

    def chunk(typ, body):
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return st.pack(">I", len(body)) + typ + body + st.pack(">I", crc)

    png = (
        mm._PNG_SIG
        + chunk(b"IHDR", st.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = mm._png_pixels(png)
    assert out is not None and out.shape == (h, w, 1)
    assert (out[..., 0] == (vals >> 8).astype(np.uint8)).all()


def test_chat_template_and_turn_stats(spark):
    from pyspark.sql import Row

    rows = [
        (1, [Row(role="system", content="be brief"),
             Row(role="user", content="hi"),
             Row(role="assistant", content="hello!")]),
        (2, [Row(role="user", content="a"),
             Row(role="user", content="b"),       # broken alternation
             Row(role="assistant", content="c")]),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id long, messages array<struct<role string, content string>>",
    )
    out = {
        r["conv_id"]: r
        for r in df.select(
            "conv_id",
            tx.render_chat_template(F.col("messages")).alias("text"),
            *[
                c.alias(n)
                for n, c in tx.chat_turn_stats(F.col("messages")).items()
            ],
        ).collect()
    }
    assert out[1]["text"] == (
        "<s><|system|>be brief</s><|user|>hi</s><|assistant|>hello!</s>"
    )
    assert out[1]["n_turns"] == 3 and out[1]["roles_alternate"]
    assert abs(out[1]["assistant_char_frac"] - 6 / 16) < 1e-9
    assert not out[2]["roles_alternate"]


def test_assistant_spans_match_rendered_text(spark):
    from pyspark.sql import Row

    rows = [
        (1, [Row(role="system", content="be brief"),
             Row(role="user", content="hi"),
             Row(role="assistant", content="hello!"),
             Row(role="user", content="more?"),
             Row(role="assistant", content="ok")]),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id long, messages array<struct<role string, content string>>",
    )
    r = df.select(
        tx.render_chat_template(F.col("messages")).alias("text"),
        tx.assistant_spans(F.col("messages")).alias("spans"),
    ).collect()[0]
    text, spans = r["text"], r["spans"]
    got = [text[s["start"] : s["end"]] for s in spans]
    assert got == ["hello!", "ok"]  # spans slice exactly the contents


def _textured_image(seed: int) -> "np.ndarray":
    """Box-blurred seeded noise — a natural-texture stand-in whose DCT
    coefficients are generic (a flat synthetic gradient has dozens of
    EXACT-zero coefficients, which makes any median-threshold hash
    flutter; real photos do not)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    noise = rng.normal(0, 1, (64, 64))
    c = noise.cumsum(0).cumsum(1)
    pad = np.zeros((72, 72))
    pad[8:, 8:] = c
    box = pad[8:, 8:] - pad[:-8, 8:] - pad[8:, :-8] + pad[:-8, :-8]
    img = ((box - box.min()) / (box.max() - box.min()) * 255).astype(
        np.uint8
    )
    return np.stack([img] * 3, axis=-1)


def test_image_near_duplicates_phash(spark):
    """Re-encoded / downscaled copies of one image pair up; a
    different image stays unpaired; junk drops out."""
    from lms_erp_data_integration_spark.operators.jpeg import encode_jpeg

    base = _textured_image(1)
    other = _textured_image(99)
    rows = [
        (1, bytearray(encode_jpeg(base, quality=95))),
        (2, bytearray(encode_jpeg(base, quality=60))),  # heavy re-encode
        (3, bytearray(mm.encode_png(base))),            # lossless twin
        (4, bytearray(encode_jpeg(base[::2, ::2], quality=95))),  # resized
        (5, bytearray(encode_jpeg(other, quality=95))),
        (6, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r["i"], r["j"]): r["hamming"]
        for r in mm.image_near_duplicates(df, max_hamming=8).collect()
    }
    for expect in [(1, 2), (1, 3), (2, 3), (1, 4)]:
        assert expect in pairs, (expect, pairs)
    assert all(5 not in p and 6 not in p for p in pairs)
    assert pairs[(1, 3)] <= 2  # lossless twin ~ identical hash


def test_audio_fingerprint_invariances():
    import math
    import struct as st

    import numpy as np

    def tone_mix(amp, rate=8000, n=8000):
        return [
            int(
                amp
                * (
                    math.sin(2 * math.pi * 440 * t / rate)
                    + 0.5 * math.sin(2 * math.pi * 1320 * t / rate)
                )
            )
            for t in range(n)
        ]

    loud = _wav_bytes(samples=tone_mix(12000))
    quiet = _wav_bytes(samples=tone_mix(3000))  # volume-scaled
    different = _wav_bytes(
        samples=[
            int(12000 * math.sin(2 * math.pi * 3500 * t / 8000))
            for t in range(8000)
        ]
    )
    fa, fb = mm.audio_fingerprint(loud), mm.audio_fingerprint(quiet)
    fc = mm.audio_fingerprint(different)
    assert fa is not None and fa == fb  # volume-invariant
    assert bin(fa ^ fc).count("1") >= 8  # different content separates
    assert mm.audio_fingerprint(b"not audio") is None


def test_video_fingerprint_structural():
    payload, _frames = _mp4_with_samples()
    fa = mm.video_fingerprint(payload)
    assert fa is not None
    # byte-identical copy collides
    assert mm.video_fingerprint(bytes(payload)) == fa
    # a different frame-size structure separates: quantization is
    # 6 bits on size>>6, so shift one frame into another bucket by
    # scaling the whole fixture's sizes via a rebuilt sample table
    table = mm.mp4_sample_table(payload)
    import hashlib

    def fp_of(sizes, dur_s):
        q = bytes(min(63, s >> 6) for s in sizes)
        d = hashlib.md5(q + b"|" + str(dur_s).encode()).digest()
        return int.from_bytes(d[:8], "big") >> 1

    got_sizes = [s["n_bytes"] for s in table]
    assert fa == fp_of(got_sizes, 0)  # duration 200/1000 -> 0 s bucket
    assert fp_of([s + 64 for s in got_sizes], 0) != fa
    assert mm.video_fingerprint(b"junk") is None


def test_hamming_near_duplicates_generic(spark):
    """The shared pairing API works over any 64-bit hash column —
    here, audio fingerprints: volume-scaled copies pair at distance 0,
    different content stays out."""
    import math

    def mix(amp):
        return _wav_bytes(
            samples=[
                int(
                    amp
                    * (
                        math.sin(2 * math.pi * 440 * t / 8000)
                        + 0.5 * math.sin(2 * math.pi * 1320 * t / 8000)
                    )
                )
                for t in range(8000)
            ]
        )

    def tone(amp, hz):
        return _wav_bytes(
            samples=[
                int(amp * math.sin(2 * math.pi * hz * t / 8000))
                for t in range(8000)
            ]
        )

    rows = [
        (1, mm.audio_fingerprint(mix(12000))),
        (2, mm.audio_fingerprint(mix(3000))),
        (3, mm.audio_fingerprint(tone(12000, 3500))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    pairs = {
        (r["i"], r["j"]): r["hamming"]
        for r in mm.hamming_near_duplicates(df, "fp", max_hamming=4).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert all(3 not in p for p in pairs)


def test_pdf_text_extraction(spark):
    """Simple-PDF text extraction round trip, raw and FlateDecode'd,
    escapes and nested parens included — then through a Spark stage
    into the text-curation surface."""
    lines = ["Hello PDF world.", "Second (line) with \\ escapes."]
    for comp in (True, False):
        text = mm.extract_pdf_text(mm.build_pdf(lines, compress=comp))
        assert text.split("\n") == lines
    assert mm.extract_pdf_text(b"%PDF-1.4 junk without streams") == ""
    assert mm.extract_pdf_text(b"not a pdf") is None

    # distributed: PDFs in, quality-screenable text out
    from pyspark.sql import types as T

    def op(batches):
        import pandas as pd

        for pdf_batch in batches:
            rows = []
            for i, p in zip(pdf_batch["doc_id"], pdf_batch["payload"]):
                t = mm.extract_pdf_text(p)
                if t:
                    rows.append({"doc_id": i, "text": t})
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    df = spark.createDataFrame(
        [(1, bytearray(mm.build_pdf(lines))), (2, b"junk")],
        "doc_id long, payload binary",
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    got = df.mapInPandas(op, schema).collect()
    assert len(got) == 1 and "Hello PDF world." in got[0]["text"]


def test_docx_text_extraction():
    paras = ["First paragraph.", "Second & <tagged> one."]
    text = mm.extract_docx_text(mm.build_docx(paras))
    assert text.split("\n") == paras
    assert mm.extract_docx_text(b"not a zip") is None
    # a zip without the document part is not a docx
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    assert mm.extract_docx_text(buf.getvalue()) is None


def test_extract_document_texts_mixed(spark):
    from lms_erp_data_integration_spark.operators import text as tx

    rows = [
        (1, bytearray(mm.build_pdf(["PDF body text."]))),
        (2, bytearray(mm.build_docx(["Docx body text."]))),
        (3, b"<html><body><p>Web body text.</p></body></html>"),
        (4, "plain utf-8 text ✓".encode()),
        (5, bytes([0xFF, 0xFE, 0x00, 0x99]) * 4),  # binary junk
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = mm.extract_document_texts(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["doc_format"] == "pdf" and "PDF body" in got[1]["text"]
    assert got[2]["doc_format"] == "docx"
    assert got[4]["doc_format"] == "text" and "✓" in got[4]["text"]
    # html rows finish JVM-side through the codegen'd stripper
    html_txt = (
        out.where(F.col("doc_format") == "html")
        .select(tx.html_to_text(F.col("text")).alias("t"))
        .collect()[0]["t"]
    )
    assert html_txt == "Web body text."


def test_ico_png_and_bmp_entries():
    import struct as st

    import numpy as np

    # PNG-embedded entry
    img = np.full((8, 8, 3), 33, np.uint8)
    png = mm.encode_png(img)
    ico = (b"\x00\x00\x01\x00" + st.pack("<H", 1)
           + bytes([8, 8, 0, 0]) + st.pack("<HHII", 1, 32, len(png), 22)
           + png)
    px = mm._decode_pixels(ico)
    assert px is not None and (px == img).all()
    meta = mm.decode_image(ico)
    assert (meta["width"], meta["height"]) == (8, 8)

    # header-less BMP entry: 2x2 32-bit BGRA, doubled height, bottom-up
    pix_rgba = np.array(
        [[[255, 0, 0, 255], [0, 255, 0, 255]],
         [[0, 0, 255, 255], [9, 9, 9, 255]]], np.uint8
    )
    bgra_rows_bottom_up = pix_rgba[::-1][..., [2, 1, 0, 3]]
    dib = st.pack("<IiiHHIIiiII", 40, 2, 4, 1, 32, 0, 0, 0, 0, 0, 0)
    blob = dib + bgra_rows_bottom_up.tobytes() + b"\x00" * 8  # + AND mask
    ico2 = (b"\x00\x00\x01\x00" + st.pack("<H", 1)
            + bytes([2, 2, 0, 0]) + st.pack("<HHII", 1, 32, len(blob), 22)
            + blob)
    px2 = mm._decode_pixels(ico2)
    assert px2 is not None and px2.shape == (2, 2, 4)
    assert (px2 == pix_rgba).all()
    assert mm._decode_ico_pixels(b"junk") is None


def test_epub_chapters_to_text(spark):
    import io
    import zipfile

    from lms_erp_data_integration_spark.operators import text as tx

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("content.opf", "<package/>")
        zf.writestr(
            "ch1.xhtml",
            "<html><body><p>Chapter one text.</p></body></html>",
        )
        zf.writestr(
            "ch2.xhtml",
            "<html><body><p>Chapter two text.</p></body></html>",
        )
    epub = buf.getvalue()
    chapters = mm.extract_epub_html(epub)
    assert [n for n, _ in chapters] == ["ch1.xhtml", "ch2.xhtml"]
    # strip JVM-side
    df = spark.createDataFrame(chapters, "name string, html string")
    texts = {
        r["name"]: r["t"]
        for r in df.select(
            "name", tx.html_to_text(F.col("html")).alias("t")
        ).collect()
    }
    assert texts["ch1.xhtml"] == "Chapter one text."
    assert mm.extract_epub_html(b"not a zip") is None
    # a plain docx zip is not an epub
    assert mm.extract_epub_html(mm.build_docx(["x"])) is None


def test_wav_mulaw_decode_matches_linear_reference():
    """G.711 mu-law WAV (format 7): decoding a companded ramp must
    reproduce the linear ramp's RMS (companding round-trips within
    quantization), pinned against a textbook encoder."""
    import struct as st

    import numpy as np

    def mulaw_encode(x):
        BIAS, CLIP = 0x84, 32635
        out = []
        for s in x:
            sign = 0x80 if s < 0 else 0
            if s < 0:
                s = -s
            s = min(s, CLIP) + BIAS
            exp, mask = 7, 0x4000
            while exp > 0 and not (s & mask):
                exp -= 1
                mask >>= 1
            mant = (s >> (exp + 3)) & 0x0F
            out.append(~(sign | (exp << 4) | mant) & 0xFF)
        return bytes(out)

    vals = np.linspace(-30000, 30000, 200).astype(int)
    enc = mulaw_encode(vals)
    fmtch = st.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    wav = (b"RIFF" + st.pack("<I", 36 + len(enc)) + b"WAVE"
           + b"fmt " + st.pack("<I", len(fmtch)) + fmtch
           + b"data" + st.pack("<I", len(enc)) + enc)
    meta = mm.decode_wav(wav)
    assert meta is not None and meta["sample_rate"] == 8000
    ref_rms = float(np.sqrt(np.mean((vals / 32768.0) ** 2)))
    assert abs(meta["rms_milli"] / 1000 - ref_rms) < 0.02
    # format 3 (float) stays rejected
    bad = bytearray(wav)
    bad[20] = 3
    assert mm.decode_wav(bytes(bad)) is None


def test_tga_decode_raw_rle_palette():
    import struct as st

    import numpy as np

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)

    def tga_raw(px, top_down=True):
        h, w, _ = px.shape
        hdr = bytes([0, 0, 2]) + b"\x00" * 9 + st.pack("<HH", w, h) + bytes(
            [24, 0x20 if top_down else 0]
        )
        body = px[..., [2, 1, 0]] if top_down else px[::-1][..., [2, 1, 0]]
        return hdr + body.tobytes()

    for td in (True, False):
        out = mm._decode_pixels(tga_raw(img, top_down=td))
        assert out is not None and (out == img).all(), td

    # RLE: a solid row compresses to run packets
    solid = np.tile(np.array([[10, 20, 30]], np.uint8), (3, 130, 1))
    h, w, _ = solid.shape
    hdr = bytes([0, 0, 10]) + b"\x00" * 9 + st.pack("<HH", w, h) + bytes(
        [24, 0x20]
    )
    body = bytearray()
    for _row in range(h):
        left = w
        while left:
            n = min(128, left)
            body += bytes([0x80 | (n - 1), 30, 20, 10])  # BGR run
            left -= n
    out = mm._decode_pixels(hdr + bytes(body))
    assert out is not None and (out == solid).all()

    # 8-bit palette (type 1)
    pal = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    hdr = (bytes([0, 1, 1]) + st.pack("<HHB", 0, 2, 24) + b"\x00" * 4
           + st.pack("<HH", 2, 2) + bytes([8, 0x20]))
    blob = hdr + pal[:, [2, 1, 0]].tobytes() + idx.tobytes()
    out = mm._decode_pixels(blob)
    assert out is not None and (out == pal[idx]).all()


def test_tiff_lzw_and_predictor_round_trip():
    import numpy as np

    rng = np.random.default_rng(9)
    for be in (False, True):
        for pred in (False, True):
            img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
            t = mm.encode_tiff(img, big_endian=be, lzw=True, predictor=pred)
            out = mm._decode_tiff_pixels(t)
            assert out is not None and (out == img).all(), (be, pred)
    # smooth gradients compress well under predictor+LZW
    grad = np.tile(np.arange(200, dtype=np.uint8), (40, 1))
    plain = mm.encode_tiff(grad)
    packed = mm.encode_tiff(grad, lzw=True, predictor=True)
    assert len(packed) < len(plain) // 4
    assert (mm._decode_tiff_pixels(packed)[..., 0] == grad).all()


# ---------------------------------------------------------------- AVI


def _mjpeg_avi(n_frames=4, w=16, h=8, fps=5, seed=7):
    import numpy as np

    from lms_erp_data_integration_spark.operators import avi
    from lms_erp_data_integration_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    frames = [
        encode_jpeg(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        for _ in range(n_frames)
    ]
    return avi.build_avi_mjpeg(frames, w, h, fps=fps), frames


def test_avi_mux_demux_round_trip():
    from lms_erp_data_integration_spark.operators import avi

    payload, frames = _mjpeg_avi()
    meta = avi.avi_meta(payload)
    assert meta == {
        "width": 16, "height": 8, "n_frames": 4,
        "us_per_frame": 200000, "handler": "MJPG",
        "bpp": 24, "compression": "MJPG",
    }
    got = list(avi.iter_avi_frames(payload))
    assert [i for i, _ in got] == [0, 1, 2, 3]
    assert [f for _, f in got] == frames
    # truncations end iteration, never raise
    for cut in (0, 3, 11, 13, 57, len(payload) // 2, len(payload) - 1):
        list(avi.iter_avi_frames(payload[:cut]))
        avi.avi_meta(payload[:cut])


def test_extract_video_frames_avi_and_decode_stats(spark):
    import zlib

    from lms_erp_data_integration_spark.operators.jpeg import decode_jpeg

    payload, frames = _mjpeg_avi()
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, b"not video")],
        "doc_id long, payload binary",
    )
    got = mm.extract_video_frames(df, every_n=2).collect()
    assert sorted(r["sample_idx"] for r in got) == [0, 2]
    by_idx = {r["sample_idx"]: r for r in got}
    assert bytes(by_idx[0]["frame_bytes"]) == frames[0]
    assert by_idx[2]["dts_ms"] == 400

    stats = mm.decode_video_frame_stats(
        mm.extract_video_frames(df, every_n=1)
    ).collect()
    assert len(stats) == 4  # every MJPEG frame really decodes
    expect0 = decode_jpeg(frames[0])
    r0 = next(r for r in stats if r["sample_idx"] == 0)
    assert (r0["width"], r0["height"]) == (16, 8)
    assert r0["pixel_crc32"] == zlib.crc32(expect0.tobytes())


def test_dib_frame_roundtrip_exact():
    """rawvideo codec core: encode->decode must be bit-exact at odd
    widths (stride padding) and reject short buffers."""
    import numpy as np

    from lms_erp_data_integration_spark.operators import avi

    rng = np.random.default_rng(42)
    for w, h in ((16, 8), (13, 5), (1, 1), (31, 7)):
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fb = avi.encode_dib_frame(rgb)
        assert len(fb) == avi.dib_stride(w) * h
        back = avi.decode_dib_frame(fb, w, h)
        assert np.array_equal(back, rgb)
    assert avi.decode_dib_frame(b"\x00" * 10, 13, 5) is None
    assert avi.decode_dib_frame(b"", 0, 0) is None
    assert avi.decode_dib_frame(b"\x00" * 64, 4, 4, bpp=8) is None


def test_rawvideo_avi_mux_meta_and_decode(spark):
    """build_avi_rawvideo -> avi_meta reports BI_RGB ('raw', 24 bpp);
    the operator chain dispatches on it and decodes pixels exactly."""
    import zlib

    import numpy as np

    from lms_erp_data_integration_spark.operators import avi

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (8, 16, 3), dtype=np.uint8) for _ in range(3)]
    payload = avi.build_avi_rawvideo(frames, 16, 8, fps=5)
    meta = avi.avi_meta(payload)
    assert meta["compression"] == "raw" and meta["bpp"] == 24
    assert meta["handler"] == "DIB" and meta["n_frames"] == 3
    # MJPEG meta still reports its fourcc
    mj, _ = _mjpeg_avi()
    mm_meta = avi.avi_meta(mj)
    assert mm_meta["compression"] == "MJPG" and mm_meta["bpp"] == 24

    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    ext = mm.extract_video_frames(df, every_n=1)
    rows = ext.collect()
    assert [r["codec"] for r in rows] == ["raw"] * 3
    assert rows[0]["frame_width"] == 16 and rows[0]["frame_height"] == 8
    stats = mm.decode_video_frame_stats(ext).collect()
    assert len(stats) == 3
    by_idx = {r["sample_idx"]: r for r in stats}
    for i, f in enumerate(frames):
        assert by_idx[i]["pixel_crc32"] == zlib.crc32(f.tobytes())
        assert (by_idx[i]["width"], by_idx[i]["height"]) == (16, 8)


def test_mp4_raw_mux_config_and_decode(spark):
    """'raw '-in-MP4: build_mp4_raw -> mp4_video_config reports rgb24
    geometry from the stsd entry; the operator chain dispatches and
    decodes packed top-down RGB exactly."""
    import zlib

    import numpy as np

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (8, 16, 3), dtype=np.uint8) for _ in range(4)]
    payload = mm.build_mp4_raw(frames, 16, 8, fps=5)
    cfg = mm.mp4_video_config(payload)
    assert cfg == {"codec": "rgb24", "width": 16, "height": 8, "depth": 24}
    # sample table agrees with the mux
    table = mm.mp4_sample_table(payload)
    assert [s["n_bytes"] for s in table] == [16 * 8 * 3] * 4
    assert [s["dts_ms"] for s in table] == [0, 200, 400, 600]
    # fixtures without stsd (demux-only H.264-shaped) report None
    assert mm.mp4_video_config(_mp4_with_samples()[0]) is None
    # r7 ADVICE: spec-compliant version-0 tkhd — exactly 84-byte
    # body with 16.16 width/height at offset 76 and the identity
    # matrix at offset 40, so external parsers read the geometry too
    i = payload.index(b"tkhd")
    size = int.from_bytes(payload[i - 4 : i], "big")
    body = payload[i + 4 : i - 4 + size]
    assert len(body) == 84
    assert int.from_bytes(body[40:44], "big") == 0x00010000
    assert int.from_bytes(body[72:76], "big") == 0x40000000
    assert int.from_bytes(body[76:80], "big") >> 16 == 16
    assert int.from_bytes(body[80:84], "big") >> 16 == 8

    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    ext = mm.extract_video_frames(df, every_n=1)
    rows = ext.collect()
    assert [r["codec"] for r in rows] == ["rgb24"] * 4
    stats = mm.decode_video_frame_stats(ext).collect()
    assert len(stats) == 4
    by_idx = {r["sample_idx"]: r for r in stats}
    for i, f in enumerate(frames):
        assert by_idx[i]["pixel_crc32"] == zlib.crc32(f.tobytes())
        assert (by_idx[i]["width"], by_idx[i]["height"]) == (16, 8)


def test_decode_video_frame_stats_drops_undecodable(spark):
    # MP4-demuxed access units are not JPEG: decode stage must drop
    # them (the explicit decoded-vs-demuxed boundary), not crash
    payload, _frames = _mp4_with_samples()
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    frames = mm.extract_video_frames(df, every_n=1)
    assert frames.count() == 5
    assert mm.decode_video_frame_stats(frames).count() == 0


def test_audio_fingerprint_short_segments_no_crash():
    """r6 regression: segments shorter than ~256 samples made the
    band-edge padding walk past the spectrum and crash reduceat; any
    valid WAV with >= 64 samples must fingerprint, not raise."""
    import struct as st

    import numpy as np

    for n in (64, 100, 400, 999):
        data = (np.arange(n, dtype=np.int64) * 37 % 20000 - 10000).astype(
            "<i2"
        ).tobytes()
        fmtch = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        wav = (b"RIFF" + st.pack("<I", 28 + len(data)) + b"WAVE"
               + b"fmt " + st.pack("<I", len(fmtch)) + fmtch
               + b"data" + st.pack("<I", len(data)) + data)
        fp = mm.audio_fingerprint(wav)
        assert fp is not None and 0 <= fp < (1 << 64)


def test_alaw_fixture_encoder_round_trips_repo_decoder():
    """The A-law fixture companding in plans/media_queries.py must be
    the exact inverse of the repo decoder's segment layout (within
    G.711 quantization): RMS must track the linear signal closely."""
    import struct as st

    import numpy as np

    from lms_erp_data_integration_spark.plans.media_queries import (
        _alaw_encode,
    )

    vals = np.linspace(-30000, 30000, 300).astype(int)
    enc = _alaw_encode(vals, np)
    fmtch = st.pack("<HHIIHH", 6, 1, 8000, 8000, 1, 8)
    wav = (b"RIFF" + st.pack("<I", 28 + len(enc)) + b"WAVE"
           + b"fmt " + st.pack("<I", len(fmtch)) + fmtch
           + b"data" + st.pack("<I", len(enc)) + enc)
    meta = mm.decode_wav(wav)
    ref_rms = float(np.sqrt(np.mean((vals / 32768.0) ** 2)))
    assert abs(meta["rms_milli"] / 1000 - ref_rms) < 0.02


def test_tiff_tiled_roundtrip_matrix():
    """TIFF 6.0 tile layout: per-tile prediction/compression, edge
    padding cropped, both byte orders, gray + RGB — bit-exact."""
    import numpy as np

    rng = np.random.default_rng(3)
    n = 0
    for h, w in ((17, 33), (16, 16), (40, 25)):
        for c in (1, 3):
            img = rng.integers(
                0, 256, (h, w) if c == 1 else (h, w, c), dtype=np.uint8
            )
            for be in (False, True):
                for lzw, pb, pred in (
                    (False, False, False),
                    (True, False, True),
                    (False, True, False),
                ):
                    for ts in ((16, 16), (16, 32)):
                        p = mm.encode_tiff(
                            img, big_endian=be, lzw=lzw, packbits=pb,
                            predictor=pred, tiled=True, tile_size=ts,
                        )
                        px = mm._decode_tiff_pixels(p)
                        want = img if img.ndim == 3 else img[..., None]
                        assert px is not None and np.array_equal(px, want)
                        n += 1
    assert n == 72
    # non-16-multiple tile dims are rejected by writer and reader
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.encode_tiff(
            np.zeros((8, 8), np.uint8), tiled=True, tile_size=(10, 16)
        )


def test_flac_roundtrip_all_paths():
    """From-scratch FLAC codec: lossless round-trip through every
    subframe type (constant / fixed / LPC / verbatim-or-escape) and
    every channel assignment; corrupted payloads are rejected by the
    CRC/MD5 checks, never mis-decoded."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.flac import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.default_rng(1)
    t = np.arange(3000)
    tone = (12000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int64)

    def rt(x, **kw):
        p = encode_flac(x, 8000, **kw)
        d = decode_flac(p)
        want = np.asarray(x, np.int64)
        if want.ndim == 1:
            want = want[:, None]
        assert d is not None
        assert np.array_equal(d["samples"].astype(np.int64), want)
        return p

    rt(tone + rng.integers(-500, 500, 3000))        # fixed/LPC
    rt(np.full(2500, 123, np.int64))                # constant
    rt(rng.integers(-32768, 32767, 2048))           # verbatim/escape
    rt(tone[:1500])                                 # partial tail block
    st = np.stack([tone[:2048], (tone[:2048] * 3) // 4], axis=1)
    for m in ("independent", "left_side", "right_side", "mid_side"):
        p = rt(st, stereo_mode=m)
    # corruption: flipping a residual byte must fail CRC/MD5, not
    # return wrong samples
    bad = bytearray(p)
    bad[len(bad) // 2] ^= 0xFF
    assert decode_flac(bytes(bad)) is None
    assert decode_flac(b"junk") is None
    assert decode_flac(b"fLaC" + b"\x00" * 50) is None


def test_flac_truncation_rejects_cleanly():
    """r7 ADVICE: a valid stream truncated at ANY byte — including
    exactly at the frame-header/CRC-8 boundary, which previously
    read payload[hdr_end] unguarded and raised IndexError — must
    return None (or the full decode when the cut is past the last
    frame), never raise."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.flac import (
        decode_flac,
        encode_flac,
    )

    t = np.arange(2000)
    tone = (9000 * np.sin(2 * np.pi * 330 * t / 8000)).astype(np.int64)
    p = encode_flac(tone, 8000)
    full = decode_flac(p)
    assert full is not None
    for cut in range(0, len(p)):
        d = decode_flac(p[:cut])  # must not raise
        assert d is None or np.array_equal(
            d["samples"], full["samples"]
        )


def test_flac_through_unified_audio_path():
    """decode_wav / spectral / fingerprint all accept FLAC via the
    single _wav_samples entry point."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.flac import encode_flac

    t = np.arange(4000)
    x = (9000 * np.sin(2 * np.pi * 330 * t / 8000)).astype(np.int64)
    p = encode_flac(x, 8000)
    meta = mm.decode_wav(p)
    assert meta is not None and meta["n_samples"] == 4000
    assert meta["sample_rate"] == 8000 and meta["channels"] == 1
    # RMS of a 9000-amplitude sine ~ 9000/32768/sqrt(2) ~ 0.194
    assert meta["rms_milli"] == 194
    assert mm.audio_fingerprint(p) is not None
    assert mm.wav_spectral_features(p) is not None


def test_ima_adpcm_roundtrip_and_decode():
    """IMA ADPCM (WAVE fmt 0x11): encoder/decoder step tables agree —
    lossy on the wire, deterministic after decode, error bounded by
    the adaptive step; mono + stereo; truncated blocks never crash."""
    import struct

    import numpy as np

    def wav(ch, balign, data):
        fmtch = struct.pack(
            "<HHIIHH", 0x11, ch, 8000, 8000 * balign, balign, 4
        )
        return (
            b"RIFF" + struct.pack("<I", 28 + len(fmtch) + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmtch)) + fmtch
            + b"data" + struct.pack("<I", len(data)) + data
        )

    t = np.arange(3000)
    base = (9000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    for ch in (1, 2):
        x = (
            np.stack([base, (base * 2) // 3], axis=1).reshape(-1)
            if ch == 2
            else base
        )
        data, ba = mm._ima_adpcm_encode(x, ch)
        assert len(data) < len(x)  # ~4:1 vs 16-bit PCM
        p = wav(ch, ba, data)
        rate, chans, s = mm._wav_samples(p)
        assert (rate, chans) == (8000, ch)
        dec = (s * 32768).round().astype(np.int64)
        n = min(len(dec), len(x))
        err = np.abs(dec[:n] - x[:n])
        assert err.max() < 3000 and float(np.mean(err)) < 400
        # deterministic decode (what the driver gate pins)
        assert np.array_equal(s, mm._wav_samples(p)[2])
        assert mm.decode_wav(p) is not None
        # truncated data: clean None/short result, no exception
        mm._ima_adpcm_decode(data[:5], ch, ba)
        assert mm._ima_adpcm_decode(b"", ch, ba) is None


def test_mp4_avc_mux_demux_decode_chain(spark):
    """H.264-in-MP4 end to end: from-scratch encoder -> annexb_to_avcc
    -> build_mp4_avc (avc1 + avcC stsd entry) -> extract_video_frames
    (mp4-to-annexb re-prefix) -> decode_video_frame_stats dispatches
    to the intra decoder; CRCs equal the encoder's closed-loop
    reconstructions."""
    import zlib

    import numpy as np

    from lms_erp_data_integration_spark.operators import h264

    ys, xs = np.mgrid[0:32, 0:48]
    frames = [
        np.stack(
            [(xs * 3 + ys + fi) % 256, (xs + ys * 5) % 256, (xs * 2) % 256],
            axis=-1,
        ).astype(np.uint8)
        for fi in range(3)
    ]
    stream, recons = h264.encode_h264_annexb(frames, qp=24)
    avcc, samples = h264.annexb_to_avcc(stream)
    payload = mm.build_mp4_avc(samples, avcc, 48, 32, fps=5)
    cfg = mm.mp4_video_config(payload)
    assert cfg["codec"] == "avc1" and (cfg["width"], cfg["height"]) == (48, 32)
    assert cfg["avcc"] == avcc

    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    ext = mm.extract_video_frames(df, every_n=1)
    rows = ext.collect()
    assert [r["codec"] for r in rows] == ["avc1"] * 3
    # frame bytes are self-contained Annex B (start code prefixed)
    assert bytes(rows[0]["frame_bytes"][:4]) == b"\x00\x00\x00\x01"
    stats = mm.decode_video_frame_stats(ext).collect()
    assert len(stats) == 3
    by_idx = {r["sample_idx"]: r for r in stats}
    for i, r in enumerate(recons):
        assert by_idx[i]["pixel_crc32"] == zlib.crc32(r.tobytes())
        assert (by_idx[i]["width"], by_idx[i]["height"]) == (48, 32)


def test_compact_dedup_index_keeps_keepers_and_uniques(spark):
    """Compaction drops exactly the non-keeper members of the index's
    internal near-dup clusters; unique docs and keepers survive, and
    a batch doc near-matching a dropped member still dedups against
    the surviving keeper."""
    # long docs so one added shingle can't dominate the affine
    # minhash mins (tiny sets make slots correlate on a small hash)
    base = " ".join(f"w{i:02d}" for i in range(30))
    rows = [
        (1, base),                       # keeper of the (1, 2) cluster
        (2, base + " tail"),             # near-dup of 1 -> dropped
        (3, "totally unrelated content about seven silver ships sailing"),
        (4, "another unique document describing mountain weather today"),
    ]
    idx = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in dd.compact_dedup_index(idx, threshold=0.5).collect()
    }
    assert kept == {1, 3, 4}
    # a new batch doc near-matching dropped member 2 still matches
    batch = spark.createDataFrame(
        [(100, base + " coda")], "doc_id long, text string"
    )
    compacted = idx.where(F.col("doc_id").isin(list(kept)))
    hits = dd.incremental_minhash_duplicates(
        compacted, batch, threshold=0.5
    ).collect()
    assert {(r["new_id"], r["index_id"]) for r in hits} == {(100, 1)}


def test_decontaminate_train_removes_eval_near_dups(spark, sf_dir):
    """The near-dup leakage guard: counts reconcile (train = removed +
    kept), the split covers all non-eval docs, and the fixture corpus
    has real cross-split leakage to remove."""
    from lms_erp_data_integration_spark.plans import QUERIES
    from lms_erp_data_integration_spark.catalog import Catalog

    rows = QUERIES["llm_decontaminate_train"](spark, sf_dir).collect()
    n_train_expect = (
        Catalog(spark, sf_dir)
        .documents.where(F.col("doc_id") % 10 != 7)
        .count()
    )
    assert sum(r["n_train"] for r in rows) == n_train_expect
    for r in rows:
        assert r["n_train"] == r["n_removed"] + r["n_kept"]
    assert sum(r["n_removed"] for r in rows) > 0  # real leakage caught


def test_matryoshka_recall_bounds_and_prefix_sensitivity(spark, sf_dir):
    """Truncated-prefix search: recall is a valid percentage, hits <=
    k, and the 16/64 prefix on untrained synthetic embeddings must
    lose SOME neighbors (a perfect 100 across all probes would mean
    the audit is vacuous)."""
    from lms_erp_data_integration_spark.plans import QUERIES

    rows = QUERIES["llm_emb_matryoshka_recall"](spark, sf_dir).collect()
    assert {r["query_id"] for r in rows} == set(range(5))
    for r in rows:
        assert 0 <= r["hits"] <= r["k"] == 10
        assert r["recall_pct"] == r["hits"] * 100 // r["k"]
    assert any(r["recall_pct"] < 100 for r in rows)


def test_memorization_span_partial_run_exact(spark):
    """Gaps-and-islands span measurement on a constructed corpus: the
    eval doc shares a 12-token contiguous block with train (expected
    span exactly 12 — 5 consecutive matched 8-windows), plus one
    isolated 8-token match later (a second, shorter island that must
    NOT extend the max). A clean doc reports 0."""
    def words(prefix, n, start=0):
        return " ".join(f"{prefix}{i}" for i in range(start, start + n))

    shared12 = words("s", 12)
    shared8 = words("x", 8)
    train = spark.createDataFrame(
        [(100, f"{words('t', 20)} {shared12} {words('u', 20)} "
               f"{shared8} {words('v', 10)}")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            # 10 unique tokens, the 12 shared, 10 unique, the 8 shared,
            # 6 unique => islands of 5 and 1 matched windows
            (0, f"{words('a', 10)} {shared12} {words('b', 10)} "
                f"{shared8} {words('c', 6)}"),
            (1, words("z", 30)),  # clean
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dd.memorization_spans(train, ev, span_tokens=8).collect()
    }
    assert rows[0]["max_span_tokens"] == 12
    assert rows[0]["n_hit_windows"] == 6  # 5-run + isolated 1
    assert rows[0]["n_tokens"] == 46
    assert rows[0]["memorized_ppm"] == 1_000_000 * 12 // 46
    assert rows[1]["max_span_tokens"] == 0
    assert rows[1]["n_hit_windows"] == 0
    assert rows[1]["memorized_ppm"] == 0


def test_ivf_append_report_matches_python_reference(spark):
    """Batch IVF-append audit vs a brute-force reference on a synthetic
    embeddings frame: nearest-centroid assignment (max cosine, ties ->
    lower centroid_id), per-list counts, and quantize-then-average
    micro arithmetic must all agree."""
    import math
    import random as _r

    from lms_erp_data_integration_spark.plans.similarity_queries import (
        ivf_append_report,
        ivf_append_side_summary,
        ivf_index_centroids,
    )

    rng = _r.Random(77)
    dim = 8
    rows = []
    for vid in range(60):
        rows.append(
            (vid, [rng.uniform(-1, 1) for _ in range(dim)], vid % 4)
        )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    index_rows = [r for r in rows if r[0] % 5 != 0]
    batch_rows = [r for r in rows if r[0] % 5 == 0]
    # python reference
    cents = {}
    for vid, v, lab in index_rows:
        if lab not in cents or vid < cents[lab][0]:
            cents[lab] = (vid, v)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )

    def assign(v):
        best = None
        for cid in sorted(cents):
            s = cos(v, cents[cid][1])
            if best is None or s > best[1]:
                best = (cid, s)
        return best

    def side(rs):
        out = {}
        for _vid, v, _lab in rs:
            cid, s = assign(v)
            n, tot = out.get(cid, (0, 0))
            out[cid] = (n + 1, tot + math.floor(s * 1_000_000 + 0.5))
        return out

    gi, gb = side(index_rows), side(batch_rows)

    def tdiv(a, b):
        q = abs(a) // b
        return -q if a < 0 else q

    expect = {}
    for cid, (n, s) in gi.items():
        nb, sb = gb.get(cid, (0, 0))
        expect[cid] = (
            n, nb, tdiv(1_000_000 * nb, n), tdiv(s, n),
            tdiv(sb, nb) if nb else 0,
        )

    from lms_erp_data_integration_spark.operators import similarity as sim

    index_df = emb.where(F.col("vec_id") % 5 != 0)
    batch_df = emb.where(F.col("vec_id") % 5 == 0)
    centroids = ivf_index_centroids(index_df)
    got = {
        r["centroid_id"]: (
            r["n_index"], r["n_appended"], r["growth_ppm"],
            r["mean_cos_index_micro"], r["mean_cos_appended_micro"],
        )
        for r in ivf_append_report(
            ivf_append_side_summary(
                sim.ivf_assign(index_df, centroids, keep_sim=True)
            ),
            ivf_append_side_summary(
                sim.ivf_assign(batch_df, centroids, keep_sim=True)
            ),
        ).collect()
    }
    assert got == expect


def test_ivf_assign_literal_matches_window_form_on_exact_ties(spark):
    """The stateless literal-centroid argmax must agree with the
    row_number-window form EVERYWHERE, including exact similarity
    ties: duplicate centroid vectors under different ids force
    bit-equal cosines, and both forms must pick the LOWER
    centroid_id."""
    import random as _r

    from lms_erp_data_integration_spark.operators import similarity as sim

    rng = _r.Random(9)
    dim = 6
    cvs = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(3)]
    # centroid 3 duplicates centroid 1's vector; 4 duplicates 0's
    cents = [(0, cvs[0]), (1, cvs[1]), (2, cvs[2]),
             (3, list(cvs[1])), (4, list(cvs[0]))]
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)
    ] + [(100, list(cvs[1])), (101, list(cvs[0]))]  # exact centroid hits
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cdf = spark.createDataFrame(
        [(cid, cv) for cid, cv in cents],
        "centroid_id long, embedding array<double>",
    )
    w = {
        r["vec_id"]: (r["centroid_id"], r["centroid_sim"])
        for r in sim.ivf_assign(vdf, cdf, keep_sim=True).collect()
    }
    lit = {
        r["vec_id"]: (r["centroid_id"], r["centroid_sim"])
        for r in sim.ivf_assign_literal(vdf, cents).collect()
    }
    assert w == lit
    # the duplicated-vector ties resolved to the LOWER ids
    assert w[100][0] == 1 and w[101][0] == 0


def test_ivf_recenter_trigger_both_decision_branches(spark):
    """The trigger row's two global branches on the SAME corpus:
    impossible thresholds -> do_recenter 0 and all recenter columns
    zero (the Lloyd step is never planned); trivial thresholds ->
    do_recenter 1 and churn/shift equal to the shared
    ivf_recenter_report on the full frame."""
    import random as _r

    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.plans.similarity_queries import (
        ivf_index_centroids,
        ivf_recenter_report,
        ivf_recenter_trigger_report,
    )

    rng = _r.Random(11)
    rows = [
        (vid, [rng.uniform(-1, 1) for _ in range(8)], vid % 3)
        for vid in range(45)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    index = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0)

    off = ivf_recenter_trigger_report(
        emb, index, batch,
        growth_ppm_trigger=10**9, drift_micro_trigger=10**9,
    ).collect()
    assert all(r.triggered == 0 and r.do_recenter == 0 for r in off)
    assert all(
        (r.n_stay, r.n_gained, r.n_lost, r.shift_cos_micro)
        == (0, 0, 0, 0)
        for r in off
    )

    on = ivf_recenter_trigger_report(
        emb, index, batch,
        growth_ppm_trigger=0, drift_micro_trigger=-(10**9),
    ).collect()
    assert all(r.triggered == 1 and r.do_recenter == 1 for r in on)
    ref = {
        r.centroid_id: r
        for r in ivf_recenter_report(
            emb, ivf_index_centroids(index)
        ).collect()
    }
    for r in on:
        assert (r.n_stay, r.n_gained, r.n_lost, r.shift_cos_micro) == (
            ref[r.centroid_id].n_stay,
            ref[r.centroid_id].n_gained,
            ref[r.centroid_id].n_lost,
            ref[r.centroid_id].shift_cos_micro,
        )


def test_dedup_compaction_trigger_both_decision_branches(spark, sf_dir):
    """Both global branches of the compaction trigger on the real
    corpus: impossible threshold -> do_compact 0, zero yield, index
    size unchanged (the pair/closure pass is never planned); trivial
    threshold -> do_compact 1 with the yield equal to the actual
    non-keeper count of the index's near-dup clusters."""
    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.catalog import Catalog
    from lms_erp_data_integration_spark.operators import dedup as dd
    from lms_erp_data_integration_spark.plans.llm_queries import (
        dedup_compaction_trigger_report,
    )

    index_df = (
        Catalog(spark, sf_dir)
        .documents.where(F.col("doc_id") % 5 != 0)
    )

    off = dedup_compaction_trigger_report(
        index_df, trigger_ppm=10**9
    ).collect()
    assert len(off) == 8
    assert all(r.triggered == 0 and r.do_compact == 0 for r in off)
    assert all(
        r.n_dropped == 0 and r.index_size_after == r.n_docs for r in off
    )

    on = dedup_compaction_trigger_report(index_df, trigger_ppm=0).collect()
    assert all(r.triggered == 1 and r.do_compact == 1 for r in on)
    pairs = dd.minhash_near_duplicates(
        index_df, threshold=0.8, num_hashes=16, bands=8, shingle_n=3
    )
    expected = (
        dd.duplicate_clusters(pairs)
        .where(F.col("member") != F.col("cluster_id"))
        .count()
    )
    assert all(
        r.n_dropped == expected
        and r.index_size_after == r.n_docs - expected
        for r in on
    )


def test_ivf_recenter_trigger_quiet_window_is_noop(spark):
    """A cadence window with NO appends must not trigger: the drift
    branch requires n_appended > 0 (without the guard, the encoded
    mean_cos_appended_micro = 0 makes every populated list look
    drifted and a quiet window spuriously recenters)."""
    import random as _r

    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.plans.similarity_queries import (
        ivf_recenter_trigger_report,
    )

    rng = _r.Random(23)
    rows = [
        (vid, [rng.uniform(-1, 1) for _ in range(8)], vid % 3)
        for vid in range(30)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    empty_batch = emb.where(F.col("vec_id") < 0)
    out = ivf_recenter_trigger_report(emb, emb, empty_batch).collect()
    assert all(r.n_appended == 0 for r in out)
    assert all(r.triggered == 0 and r.do_recenter == 0 for r in out)
    assert all(
        (r.n_stay, r.n_gained, r.n_lost, r.shift_cos_micro)
        == (0, 0, 0, 0)
        for r in out
    )


def test_ivf_nprobe_curve_invariants(spark, sf_dir):
    """Curve contract: recall@10 is monotone non-decreasing in nprobe
    (candidate sets are nested, and any candidate outscoring an exact
    top-10 member is itself in the exact top-10, so growth never
    displaces a hit), scanned cost strictly grows, and exactly one
    row is chosen — the smallest nprobe at or above the target."""
    from lms_erp_data_integration_spark.plans.similarity_queries import (
        IVF_NPROBE_MAX,
        IVF_TARGET_RECALL_PCT,
        sim_ivf_nprobe_curve,
    )

    rows = sorted(
        sim_ivf_nprobe_curve(spark, sf_dir).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == list(range(1, IVF_NPROBE_MAX + 1))
    recalls = [r.recall_pct for r in rows]
    assert recalls == sorted(recalls), "recall must be monotone"
    scans = [r.scanned_pairs for r in rows]
    assert all(b > a for a, b in zip(scans, scans[1:]))
    qualifying = [
        r.nprobe for r in rows if r.recall_pct >= IVF_TARGET_RECALL_PCT
    ]
    chosen = [r.nprobe for r in rows if r.chosen == 1]
    assert chosen == (qualifying[:1] if qualifying else [])


def test_dedup_threshold_curve_monotone(spark, sf_dir):
    """Curve contract: raising the threshold can only shrink the
    flagged-pair set and the dropped-doc set (the integer predicate
    is monotone in t), and the bookkeeping columns agree."""
    from lms_erp_data_integration_spark.plans.llm_queries import (
        DEDUP_THRESHOLD_SWEEP_PCT,
        dedup_threshold_curve,
    )

    rows = sorted(
        dedup_threshold_curve(spark, sf_dir).collect(),
        key=lambda r: r.threshold_pct,
    )
    assert [r.threshold_pct for r in rows] == list(
        DEDUP_THRESHOLD_SWEEP_PCT
    )
    pairs = [r.n_pairs for r in rows]
    dropped = [r.n_dropped for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert dropped == sorted(dropped, reverse=True)
    assert rows[0].n_pairs > 0, "sweep floor must flag something"
    for r in rows:
        assert r.n_surviving == r.n_docs - r.n_dropped
        assert r.drop_rate_ppm == (1_000_000 * r.n_dropped) // r.n_docs


def test_dedup_calibrated_apply_both_decision_branches(spark, sf_dir):
    """Both decision branches of the calibrate->apply composition on
    the real corpus: a generous budget picks the LOWEST (most
    aggressive) sweep point with within_budget = 1; an impossible
    budget falls back to the most conservative point with
    within_budget = 0. Also pins the composition's two contracts:
    the curve's direct-neighbor count lower-bounds the closure drop,
    and apply_n_dropped equals the production duplicate_clusters
    non-keeper count at the chosen point."""
    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.catalog import Catalog
    from lms_erp_data_integration_spark.operators import dedup as dd
    from lms_erp_data_integration_spark.plans.llm_queries import (
        DEDUP_THRESHOLD_SWEEP_PCT,
        _pairs_at_sweep_floor,
        dedup_calibrated_apply_frame,
    )

    docs = Catalog(spark, sf_dir).documents
    st = _pairs_at_sweep_floor(docs).persist()
    try:
        g = dedup_calibrated_apply_frame(
            spark, st, docs, budget_ppm=10**6
        ).collect()
        assert len(g) == 1
        g = g[0]
        assert g.chosen_threshold_pct == min(DEDUP_THRESHOLD_SWEEP_PCT)
        assert g.within_budget == 1
        # direct-neighbor curve count lower-bounds the closure drop
        assert g.curve_n_dropped <= g.apply_n_dropped
        assert g.apply_n_dropped > 0
        assert g.n_surviving == g.n_docs - g.apply_n_dropped
        assert g.apply_drop_ppm == (
            1_000_000 * g.apply_n_dropped
        ) // g.n_docs
        expected = (
            dd.duplicate_clusters(
                st.where(
                    F.lit(100) * F.col("ic")
                    >= F.lit(int(g.chosen_threshold_pct)) * F.col("un")
                ).select("i", "j")
            )
            .where(F.col("member") != F.col("cluster_id"))
            .count()
        )
        assert g.apply_n_dropped == expected

        f = dedup_calibrated_apply_frame(
            spark, st, docs, budget_ppm=0
        ).collect()[0]
        assert f.chosen_threshold_pct == max(DEDUP_THRESHOLD_SWEEP_PCT)
        assert f.within_budget == 0
        # the conservative fallback never drops more than the
        # aggressive point
        assert f.apply_n_dropped <= g.apply_n_dropped
    finally:
        st.unpersist()


def test_ivf_calibrated_search_both_decision_branches(spark, sf_dir):
    """Both decision branches of the ANN calibrate->search
    composition: target 0 -> every probe count qualifies, the
    smallest (nprobe=1) is chosen with met_target = 1; target 101 ->
    nothing qualifies, the IVF_NPROBE_MAX fallback with met_target =
    0. The search side must equal the production ivf_topk at the
    chosen point exactly, and the fallback's brute-force hit count is
    monotone >= the aggressive point's (more probes never lose
    recall)."""
    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.catalog import Catalog
    from lms_erp_data_integration_spark.operators import similarity as sim
    from lms_erp_data_integration_spark.plans.similarity_queries import (
        IVF_NPROBE_MAX,
        nprobe_curve_frame,
        sim_ivf_calibrated_search_frame,
    )

    emb = Catalog(spark, sf_dir).embeddings

    g = sim_ivf_calibrated_search_frame(spark, emb, target_pct=0)
    grows = g.collect()
    assert grows and all(r.met_target == 1 for r in grows)
    assert all(r.chosen_nprobe == 1 for r in grows)

    f = sim_ivf_calibrated_search_frame(spark, emb, target_pct=101)
    frows = f.collect()
    assert frows and all(r.met_target == 0 for r in frows)
    assert all(r.chosen_nprobe == IVF_NPROBE_MAX for r in frows)

    # search side == production ivf_topk at the chosen point
    centroids = emb.groupBy(F.col("label").alias("centroid_id")).agg(
        F.min_by("embedding", "vec_id").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    expected = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in sim.ivf_topk(
            emb, queries, centroids, k=10, nprobe=IVF_NPROBE_MAX
        ).collect()
    }
    # bit-exact including the float score: the r15 restructure serves
    # the search from the persisted curve candidate relation, and this
    # pins that slice == the production ivf_topk chain
    assert {
        (r.query_id, r.rank): (r.neighbor_id, r.score) for r in frows
    } == expected

    # recall monotonicity over the curve: hits never drop as nprobe
    # grows (supersets of candidate lists)
    curve = sorted(
        nprobe_curve_frame(spark, emb).collect(),
        key=lambda r: int(r["nprobe"]),
    )
    hits = [int(r["hits"]) for r in curve]
    assert hits == sorted(hits)


# ------------------------------------------------- line-level dedup (r12)


def test_line_windows_alignment_and_tail(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h x"), (2, "u v w")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["line_no"]): r["line"]
        for r in dd.line_windows(df, window=4).collect()
    }
    # 9 tokens -> two aligned lines, the tail token belongs to none;
    # a 3-token doc emits no lines at all
    assert got == {(1, 0): "a b c d", (1, 1): "e f g h"}


def test_line_dedup_stats_boilerplate_removal(spark):
    rows = [
        (1, "a b c d w x y z"),       # boilerplate at line 0
        (2, "a b c d p q r s t"),     # boilerplate + 1 tail token
        (3, "m n o p a b c d"),       # boilerplate at line 1
        (4, "x a b c d e f g"),       # misaligned -> NOT a line hit
        (5, "u v w"),                 # too short for any line
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_lines"],
            r["n_dropped_lines"],
            r["kept_tokens"],
        )
        for r in dd.line_dedup_stats(df, window=4, min_docs=3).collect()
    }
    assert out == {
        1: (8, 2, 1, 4),
        2: (9, 2, 1, 5),
        3: (8, 2, 1, 4),
        4: (8, 2, 0, 8),
        5: (3, 0, 0, 3),
    }


def test_line_dedup_below_min_docs_survives(spark):
    # the shared line sits in only two docs; min_docs=3 keeps it
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "e f g h")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["n_dropped_lines"]
        for r in dd.line_dedup_stats(df, window=4, min_docs=3).collect()
    }
    assert out == {1: 0, 2: 0, 3: 0}
    out2 = {
        r["doc_id"]: r["n_dropped_lines"]
        for r in dd.line_dedup_stats(df, window=4, min_docs=2).collect()
    }
    assert out2 == {1: 1, 2: 1, 3: 0}


# ---------------------------------------------- takedown retraction (r12)


def test_retract_report_all_transitions(spark):
    docs = spark.createDataFrame(
        [(i,) for i in (5, 7, 8, 10, 14, 15, 21, 28, 35)], "doc_id long"
    )
    clusters = spark.createDataFrame(
        [
            (7, 7), (8, 7), (10, 7),   # keeper 7 removed -> 8 re-elected
            (15, 15), (21, 15),        # non-keeper 21 removed
            (14, 14), (28, 14),        # whole cluster removed
        ],
        "member long, cluster_id long",
    )
    out = {
        r["doc_id"]: (
            r["cluster_id"],
            r["status_before"],
            r["status_after"],
            r["readmitted"],
        )
        for r in dd.retract_report(docs, clusters, removed_mod=7).collect()
    }
    assert out == {
        5: (5, "unique", "unique", False),
        7: (7, "keeper", "removed", False),
        8: (7, "dropped", "keeper", True),
        10: (7, "dropped", "dropped", False),
        14: (14, "keeper", "removed", False),
        15: (15, "keeper", "keeper", False),
        21: (15, "dropped", "removed", False),
        28: (14, "dropped", "removed", False),
        35: (35, "unique", "removed", False),
    }
