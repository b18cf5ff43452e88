"""Property-based tests (SURVEY.md section 5 upgrade over the
reference's absent unit tests): hypothesis drives the pure scalar
functions; seeded random frames drive the operator invariants (one
Spark job per property, not per example)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from lms_erp_data_integration_spark.functions import next_term_id
from lms_erp_data_integration_spark.operators import snapshot_diff
from lms_erp_data_integration_spark.operators.dedup import (
    minhash_near_duplicates,
    ngram_jaccard_duplicates,
)
from pyspark.sql import functions as F

# Domain: the reference's term ids are EXACTLY 2-char year + semester
# (integrator.py slices [:2]/[2:4]); year 99's successor leaves the
# domain ("1001S"), so double-successor properties stop at 98.
terms = st.tuples(
    st.integers(min_value=0, max_value=98), st.sampled_from(["1S", "2S"])
).map(lambda t: f"{t[0]:02d}{t[1]}")


@given(terms)
def test_term_successor_alternates_semesters(term):
    nxt = next_term_id(term)
    assert nxt[-2:] != term[2:4]  # semester always flips
    # two successors advance exactly one year
    nxt2 = next_term_id(nxt)
    assert int(nxt2[:-2]) == int(term[:2]) + 1
    assert nxt2[-2:] == term[2:4]


@given(terms)
def test_term_successor_year_monotone(term):
    nxt = next_term_id(term)
    yr, nyr = int(term[:2]), int(nxt[:-2])
    assert nyr == yr + (1 if term[2:4] == "2S" else 0)


def _random_frames(spark, seed: int):
    rng = random.Random(seed)
    keys = [(rng.randrange(20), rng.randrange(5)) for _ in range(60)]
    truth = spark.createDataFrame(
        list({k for k in keys if rng.random() < 0.7}), "a long, b long"
    )
    mirror = spark.createDataFrame(
        list({k for k in keys if rng.random() < 0.7}), "a long, b long"
    )
    return truth, mirror


def test_snapshot_diff_partitions_key_space(spark):
    """adds ∪ drops ∪ no-ops == truth ∪ mirror, pairwise disjoint."""
    for seed in (1, 2, 3):
        truth, mirror = _random_frames(spark, seed)
        out = snapshot_diff(truth, mirror, ["a", "b"])
        adds = {(r["a"], r["b"]) for r in out.where("status='active'").collect()}
        drops = {(r["a"], r["b"]) for r in out.where("status='deleted'").collect()}
        t = {(r["a"], r["b"]) for r in truth.collect()}
        m = {(r["a"], r["b"]) for r in mirror.collect()}
        assert adds == t - m
        assert drops == m - t
        assert adds.isdisjoint(drops)


def test_minhash_subset_of_exact_on_random_docs(spark):
    """LSH+verify never invents a pair the exact baseline lacks."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(15)]
        rows.append((i, " ".join(base)))
        if rng.random() < 0.3:  # planted near-dup
            mutated = list(base)
            mutated[rng.randrange(15)] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["i"], r["j"])
        for r in ngram_jaccard_duplicates(docs, threshold=0.6).collect()
    }
    lsh = {
        (r["i"], r["j"])
        for r in minhash_near_duplicates(docs, threshold=0.6).collect()
    }
    assert lsh <= exact
    assert len(exact) > 0  # planted dups found by the baseline


def test_repetition_stats_invariants_random_docs(spark):
    """Distinct counts never exceed totals; fractions stay in [0,1];
    a doc repeated k times has identical stats each time (purity)."""
    from lms_erp_data_integration_spark.operators.text import repetition_stats

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(6)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for r in repetition_stats(docs).collect():
        assert 0 <= r["n_distinct_tokens"] <= r["n_tokens"]
        assert 0 <= r["n_distinct_trigrams"] <= r["n_trigrams"]
        assert 0.0 <= r["dup_token_frac"] <= 1.0
        assert 0.0 <= r["dup_trigram_frac"] <= 1.0
        assert r["n_trigrams"] == max(r["n_tokens"] - 2, 0)


def test_drift_buckets_finds_exactly_perturbed_buckets(spark):
    """Seeded random mirrors: drift_buckets must flag a bucket IFF the
    mirror's rows in that bucket differ from the source's (drops,
    additions, or value corruption)."""
    from lms_erp_data_integration_spark.operators.diff import drift_buckets

    n_buckets = 8
    for seed in (11, 12, 13):
        rng = random.Random(seed)
        rows = [(k, rng.randrange(1000)) for k in range(200)]
        src = spark.createDataFrame(rows, "k long, v long")
        mrows = dict(rows)
        for _ in range(rng.randrange(1, 6)):
            victim = rng.randrange(200)
            if rng.random() < 0.5:
                mrows.pop(victim, None)  # drop
            else:
                mrows[victim] = mrows.get(victim, 0) + 1  # corrupt
        mirror = spark.createDataFrame(list(mrows.items()), "k long, v long")
        expect = {
            k % n_buckets
            for k in set(dict(rows)) | set(mrows)
            if dict(rows).get(k) != mrows.get(k)
        }
        ck = F.col("k") * 1000003 + F.col("v")
        got = {
            r["bucket"]
            for r in drift_buckets(
                src, mirror, ck, F.col("k"), n_buckets
            ).collect()
        }
        assert got == expect, f"seed={seed}"


def test_cdc_compaction_equals_sequential_fold(spark):
    """Seeded random change logs: the windowed compaction must equal a
    driver-side sequential replay (last op wins, tombstone deletes)."""
    from pyspark.sql import Window as W

    for seed in (21, 22):
        rng = random.Random(seed)
        log = [
            (
                i,  # seq (stands in for ts tie-break)
                rng.randrange(10),  # key
                rng.choice(["U", "U", "U", "D"]),
                rng.randrange(1000),
            )
            for i in range(120)
        ]
        df = spark.createDataFrame(log, "seq long, k long, op string, v long")
        w = W.partitionBy("k").orderBy(F.col("seq").desc())
        got = {
            (r["k"], r["v"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("op") == "U"))
            .select("k", "v")
            .collect()
        }
        state: dict[int, int | None] = {}
        for _, k, op, v in log:
            state[k] = v if op == "U" else None
        want = {(k, v) for k, v in state.items() if v is not None}
        assert got == want, f"seed={seed}"


def test_containment_dominates_jaccard_on_random_docs(spark):
    """For every candidate pair, containment >= jaccard (the union is
    at least the smaller set), and at threshold 0 the containment path
    emits exactly the exact-baseline candidate pairs with identical
    jaccard values — the two measures derive from one machinery."""
    from lms_erp_data_integration_spark.operators.dedup import (
        ngram_containment_duplicates,
    )

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(10)]
    rows = []
    for i in range(30):
        base = [rng.choice(vocab) for _ in range(12)]
        rows.append((i, " ".join(base)))
        if rng.random() < 0.4:  # planted: prefix containment
            rows.append((1000 + i, " ".join(base + base[:4])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r["i"], r["j"]): (r["containment"], r["jaccard"])
        for r in ngram_containment_duplicates(docs, threshold=0.0).collect()
    }
    exact = {
        (r["i"], r["j"]): r["jaccard"]
        for r in ngram_jaccard_duplicates(docs, threshold=0.0).collect()
    }
    assert set(cont) == set(exact)
    for pair, (c, j) in cont.items():
        assert c >= j - 1e-12, pair
        assert abs(j - exact[pair]) < 1e-12, pair
    assert len(cont) > 0


def test_minhash_estimate_bounded_on_random_docs(spark):
    """Sketch-calibration invariants: est_matches ∈ [2, 16] for LSH
    candidates (one agreeing band guarantees 2 matching slots), est =
    matches/16 exactly, and identical docs estimate 1.0 with exact
    jaccard 1.0."""
    from lms_erp_data_integration_spark.operators import dedup as dd
    from lms_erp_data_integration_spark.operators import text as tx

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(15)]
    rows = []
    for i in range(25):
        base = " ".join(rng.choice(vocab) for _ in range(14))
        rows.append((i, base))
        if i % 5 == 0:
            rows.append((1000 + i, base))  # identical twin
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    shingled = tx.word_shingles(docs, "doc_id", "text", 3)
    sigs = dd.minhash_signatures(docs, num_hashes=16)
    cands = dd.lsh_candidate_pairs(sigs, bands=8, rows_per_band=2)
    exact = dd.jaccard_on_pairs(shingled, cands)
    est = (
        cands.join(
            sigs.select(F.col("doc_id").alias("i"), F.col("sigs").alias("_si")),
            "i",
        )
        .join(
            sigs.select(F.col("doc_id").alias("j"), F.col("sigs").alias("_sj")),
            "j",
        )
        .select(
            "i",
            "j",
            F.size(
                F.filter(
                    F.zip_with(
                        F.col("_si"), F.col("_sj"), lambda x, y: x == y
                    ),
                    lambda m: m,
                )
            ).alias("est_matches"),
        )
    )
    rows_out = est.join(exact, ["i", "j"]).collect()
    assert rows_out
    twins = 0
    for r in rows_out:
        assert 2 <= r["est_matches"] <= 16, (r["i"], r["j"])
        if r["i"] + 1000 == r["j"]:
            twins += 1
            assert r["est_matches"] == 16
            assert r["jaccard"] == 1.0
    assert twins > 0


def test_triangle_count_matches_bruteforce_random_graphs(spark):
    """Degree-oriented adjacency-intersection count equals the O(n^3)
    brute force on random graphs of varied density."""
    import itertools

    from lms_erp_data_integration_spark.operators.graph import (
        triangle_count,
    )

    for seed, n, p in [(3, 12, 0.3), (7, 10, 0.6), (11, 14, 0.15)]:
        rng = random.Random(seed)
        edges = [
            (u, v)
            for u, v in itertools.combinations(range(n), 2)
            if rng.random() < p
        ]
        eset = set(edges)
        expected = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if (a, b) in eset and (b, c) in eset and (a, c) in eset
        )
        df = spark.createDataFrame(edges or [(0, 1)], "u long, v long")
        got = triangle_count(df).first()["triangles"]
        if not edges:
            continue
        assert got == expected, (seed, got, expected)


def test_entropy_and_divergence_invariants(spark):
    """Entropy: 0 for a single repeated character, <= ln(alphabet)
    (micro-nats) in general. KL divergence: 0 when a source IS the
    corpus distribution, > 0 when it diverges."""
    import math

    import __spark_entry__ as e

    qs = e.queries()
    # build a tiny corpus parquet the queries can read
    docs = spark.createDataFrame(
        [
            (0, "aaaaaaaaaa", "en", "sameA"),
            (1, "aaaaaaaaaa", "en", "sameA"),
            (2, "abababababab", "en", "mix"),
            (3, "abcdefghij", "en", "mix"),
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text").cast("long"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        ent = {
            r["doc_id"]: r["entropy_micronats"]
            for r in qs["llm_text_entropy"](spark, d).collect()
        }
        assert ent[0] == 0 and ent[1] == 0
        # two equiprobable symbols: exactly ln(2) micro-nats
        assert abs(ent[2] - round(math.log(2) * 1_000_000)) <= 1
        # ten distinct symbols: ln(10)
        assert abs(ent[3] - round(math.log(10) * 1_000_000)) <= 10
        kl = {
            r["source"]: r["kl_micronats"]
            for r in qs["llm_corpus_divergence"](spark, d).collect()
        }
        # the all-'a' source diverges from the pooled mix; both >= 0
        assert all(v >= 0 for v in kl.values())
        assert kl["sameA"] > 0


# ---------------------------------------------- r5: JPEG codec properties


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([1, 3]),
    st.integers(70, 100),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_round_trip_always_decodes(w, h, nc, quality, seed):
    """Any uint8 image at any size/quality must survive the round trip:
    decode(encode(x)) returns the exact dimensions, and the error is
    bounded by quantization (generous bound; structural bugs produce
    errors in the hundreds)."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, nc), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out is not None and out.shape == (h, w, nc)
    # luma is the structurally-protected channel: compare luminance
    if nc == 3:
        wts = np.array([0.299, 0.587, 0.114])
        a = (out.astype(float) * wts).sum(-1)
        b = (img.astype(float) * wts).sum(-1)
    else:
        a, b = out[..., 0].astype(float), img[..., 0].astype(float)
    # quantization loss only — structural bugs produce errors ~100+
    assert np.abs(a - b).mean() < 32


@settings(max_examples=15, deadline=None)
@given(st.integers(2, 20), st.integers(2, 20), st.integers(0, 2**32 - 1))
def test_jpeg_subsampled_smooth_images_close(w, h, seed):
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, 3)
    img = np.broadcast_to(base, (h, w, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert out.shape == (h, w, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 6


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 1)),
        min_size=0,
        max_size=800,
    )
)
def test_qm_coder_round_trips_any_decision_sequence(seq):
    """The QM arithmetic coder (T.81 Annex D) must be a bijection:
    any sequence of binary decisions under any shared adaptive
    context assignment decodes back exactly — covering MPS/LPS
    conditional exchange, renormalization, carry propagation through
    stacked 0xFF bytes, and the flush path."""
    from lms_erp_data_integration_spark.operators.qm import (
        QMDecoder,
        QMEncoder,
    )

    enc = QMEncoder()
    stats = bytearray(8)
    for i, d in seq:
        enc.encode(stats, i, d)
    data = enc.flush()
    # stuffing invariant: every 0xFF is followed by 0x00
    for k, b in enumerate(data):
        if b == 0xFF:
            assert k + 1 < len(data) and data[k + 1] == 0x00
    dec = QMDecoder(data)
    st2 = bytearray(8)
    assert [dec.decode(st2, i) for i, _ in seq] == [d for _, d in seq]


@settings(max_examples=20, deadline=None)
@given(
    st.integers(2, 24),
    st.integers(2, 24),
    st.sampled_from([1, 3]),
    st.integers(70, 100),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_arithmetic_always_equals_huffman(w, h, nc, quality, seed):
    """SOF9 arithmetic and baseline Huffman are two LOSSLESS entropy
    codings of the same quantized coefficients: bit-identical decodes
    for every image/quality."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_arith,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, nc), dtype=np.uint8)
    arith = decode_jpeg(encode_jpeg_arith(img, quality=quality))
    seq = decode_jpeg(encode_jpeg(img, quality=quality))
    assert arith is not None and (arith == seq).all()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 32),
    st.integers(1, 32),
    st.sampled_from([1, 3]),
    st.integers(0, 8),  # 0 = constant image (pure run mode)
    st.integers(0, 2**32 - 1),
)
def test_jpegls_roundtrip_is_lossless(w, h, nc, span, seed):
    """JPEG-LS is lossless at NEAR = 0: encode -> decode must be the
    identity for EVERY image — span sweeps constant images (pure run
    mode with end-of-line segments) through near-flat (run
    interruptions, the k = 0 bias branches) to full-range noise
    (regular mode, escape codes)."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpegls import (
        decode_jpegls,
        encode_jpegls,
    )

    rng = np.random.default_rng(seed)
    if span == 0:
        img = np.full((h, w, nc), int(rng.integers(0, 256)), np.uint8)
    elif span == 8:
        img = rng.integers(0, 256, (h, w, nc), dtype=np.uint8)
    else:
        img = (rng.integers(0, span + 1, (h, w, nc)) * 36).astype(np.uint8)
    d = decode_jpegls(encode_jpegls(img))
    assert d is not None and d.shape == img.shape and (d == img).all()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.sampled_from([3, 4]),
    st.integers(0, 8),  # small ranges force runs/index/diff chunks
    st.integers(0, 2**32 - 1),
)
def test_qoi_roundtrip_is_lossless(w, h, nc, span, seed):
    """QOI is lossless by construction: encode -> decode must be the
    identity for EVERY image — the span parameter sweeps from
    constant images (pure runs) through palette-like (index hits)
    to full-range noise (literal RGB/RGBA chunks)."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.qoi import (
        decode_qoi,
        encode_qoi,
    )

    rng = np.random.default_rng(seed)
    if span == 0:
        img = np.full((h, w, nc), int(rng.integers(0, 256)), np.uint8)
    else:
        img = (rng.integers(0, span + 1, (h, w, nc)) * 37).astype(np.uint8)
    d = decode_qoi(encode_qoi(img))
    assert d is not None and d.shape == img.shape and (d == img).all()


@settings(max_examples=20, deadline=None)
@given(
    st.integers(2, 24),
    st.integers(2, 24),
    st.sampled_from([1, 3]),
    st.integers(70, 100),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_progressive_always_equals_sequential(w, h, nc, quality, seed):
    """Progressive and sequential are two LOSSLESS entropy codings of
    the same quantized coefficients, so their decodes must be
    bit-identical for every image/quality — one property covering DC
    first/refine, AC first/refine, spectral bands, and EOB handling."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, nc), dtype=np.uint8)
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    seq = decode_jpeg(encode_jpeg(img, quality=quality))
    assert prog is not None and (prog == seq).all()


@settings(max_examples=20, deadline=None)
@given(
    st.integers(2, 24),
    st.integers(2, 24),
    st.sampled_from([1, 3]),
    st.integers(70, 100),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_arith_progressive_always_equals_huffman(
    w, h, nc, quality, seed
):
    """SOF10 (arithmetic progressive) and SOF2 (Huffman progressive)
    are two LOSSLESS entropy codings of the same quantized
    coefficients under the same scan script, so their decodes must be
    bit-identical for every image/quality — one property covering the
    QM-coded DC first/refine, banded AC first/refine, and the
    previous-stage EOB-index decisions."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_arith_progressive,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, nc), dtype=np.uint8)
    arith = decode_jpeg(encode_jpeg_arith_progressive(img, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    assert arith is not None and (arith == prog).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 30),
    st.integers(1, 30),
    st.sampled_from([2, 4, 16, 256]),
    st.booleans(),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_gif_round_trip_lossless(w, h, npal, interlace, compress, seed):
    """GIF is lossless: decode(encode(idx, pal)) == pal[idx] for every
    size, palette, interlace, and compression mode."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.gif import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
    idx = rng.integers(0, npal, (h, w))
    out = decode_gif(
        encode_gif(idx, pal, interlace=interlace, compress=compress)
    )
    assert out is not None and (out == pal[idx]).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 30),
    st.integers(1, 30),
    st.sampled_from([1, 3]),
    st.booleans(),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_tiff_round_trip_lossless(w, h, nc, big_endian, packbits, seed):
    import numpy as np

    from lms_erp_data_integration_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, nc), dtype=np.uint8)
    t = mm.encode_tiff(img, big_endian=big_endian, packbits=packbits)
    out = mm._decode_tiff_pixels(t)
    assert out is not None and (out == img).all()


def test_canonical_url_idempotent_and_folding(spark):
    """canonical_url is a projection into its own fixed-point set:
    applying it twice equals applying it once (the property that makes
    it a safe dedup KEY), and all surface variants of one URL fold to
    one key."""
    import random as _r

    from lms_erp_data_integration_spark.operators.text import canonical_url
    from pyspark.sql import functions as F

    rng = _r.Random(3)
    hosts = ["Example.com", "www.example.com", "EXAMPLE.COM:443"]
    urls = []
    for i in range(60):
        h = rng.choice(hosts)
        q = rng.choice(["", "?q=1", "?q=1&utm_source=x", "?utm_b=1&q=1"])
        s = rng.choice(["https://", "http://", ""])
        t = rng.choice(["", "/"])
        urls.append((i, f"{s}{h}/p{i % 5}{t}{q}"))
    df = spark.createDataFrame(urls, "id long, url string")
    once = df.select("id", canonical_url(F.col("url")).alias("c1"))
    twice = once.select(
        "id", "c1", canonical_url(F.col("c1")).alias("c2")
    )
    bad = twice.where(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad[:5]
    # 5 paths x 2 query-value states = at most 10 distinct keys
    n_keys = once.select("c1").distinct().count()
    assert n_keys <= 10


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=400), st.integers(0, 2**32 - 1))
def test_decoders_never_raise_on_garbage(blob, seed):
    """Corpus-scale ingestion guarantee: every payload decoder returns
    None/empty on arbitrary bytes — never an exception. Also fuzzes
    TRUNCATIONS of valid files (the common corruption), and garbage
    with valid magic numbers prepended (the adversarial case)."""
    import numpy as np

    from lms_erp_data_integration_spark.operators import multimodal as mm
    from lms_erp_data_integration_spark.operators.gif import (
        decode_gif,
        gif_frame_count,
    )
    from lms_erp_data_integration_spark.operators.jpeg import decode_jpeg
    from lms_erp_data_integration_spark.sources.warc import iter_warc_records

    probes = [
        mm.decode_image,
        mm._decode_pixels,
        mm.decode_wav,
        mm.wav_spectral_features,
        mm.probe_mp4,
        mm.mp4_sample_table,
        mm._decode_tiff_pixels,
        decode_gif,
        gif_frame_count,
        decode_jpeg,
        lambda p: list(mm.iter_tar_members(p)),
        lambda p: list(iter_warc_records(p)),
        mm.perceptual_hash,
        mm.audio_fingerprint,
        mm.video_fingerprint,
    ]
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    from lms_erp_data_integration_spark.operators.jpeg import encode_jpeg

    valid = [
        encode_jpeg(img),
        mm.encode_png(img),
        mm.encode_tiff(img),
        mm.encode_png(img[..., 0]),
    ]
    magics = [b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"RIFF",
              b"II*\x00", b"MM\x00*", b"P6\n", b"BM", b"WARC/1.0\r\n"]
    cases = [blob] + [m + blob for m in magics]
    for v in valid:
        cut = int(rng.integers(0, len(v)))
        cases.append(v[:cut])
        mutated = bytearray(v)
        if mutated:
            mutated[int(rng.integers(0, len(mutated)))] ^= 0xFF
        cases.append(bytes(mutated))
    for payload in cases:
        for probe in probes:
            probe(payload)  # must not raise


# ---------------------------------------------------------- containers

_payload = st.binary(min_size=0, max_size=300)
_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-", min_size=1, max_size=20
)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(_payload, min_size=0, max_size=6),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
    st.booleans(),
)
def test_avi_mux_demux_round_trip_property(frames, w, h, gz_unused):
    """Any frame byte sequence round-trips the AVI muxer: demux yields
    the same frames in order, and the header reports their count."""
    from lms_erp_data_integration_spark.operators import avi

    payload = avi.build_avi_mjpeg(frames, w, h, fps=7)
    got = list(avi.iter_avi_frames(payload))
    assert [f for _, f in got] == frames
    meta = avi.avi_meta(payload)
    assert meta["n_frames"] == len(frames)
    assert (meta["width"], meta["height"]) == (w, h)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["response", "resource", "metadata"]),
                  _payload),
        min_size=0, max_size=5,
    ),
    st.booleans(),
)
def test_warc_build_parse_round_trip_property(recs, gzipped):
    """build_warc -> iter_warc_records/iter_warc_stream round-trips
    bodies for non-HTTP record types, batch and streaming agree, and
    arbitrary truncation never raises."""
    import io

    from lms_erp_data_integration_spark.sources.warc import (
        build_warc,
        iter_warc_records,
        iter_warc_stream,
    )

    records = [
        {"record_type": "resource" if rt == "response" else rt,
         "target_uri": f"http://x/{i}", "body": body}
        for i, (rt, body) in enumerate(recs)
    ]
    payload = build_warc(records, gzipped=gzipped)
    batch = list(iter_warc_records(payload))
    stream = list(iter_warc_stream(io.BytesIO(payload)))
    assert batch == stream
    assert [r["body"] for r in batch] == [r["body"] for r in records]
    for cut in {0, 1, len(payload) // 3, max(len(payload) - 2, 0)}:
        list(iter_warc_stream(io.BytesIO(payload[:cut])))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(_name, _payload), min_size=0, max_size=6,
             unique_by=lambda t: t[0]),
    st.booleans(),
)
def test_tar_shard_round_trip_property(members, gzipped):
    from lms_erp_data_integration_spark.operators.multimodal import (
        build_tar_shard,
        iter_tar_members,
    )

    payload = build_tar_shard(members, gzipped=gzipped)
    got = list(iter_tar_members(payload))
    assert [(n, bytes(d)) for n, d in got] == [
        (n, d) for n, d in members
    ]


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 2),
    st.integers(1, 700),
    st.integers(64, 512),
    st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
    st.randoms(use_true_random=False),
)
def test_flac_lossless_round_trip_property(
    channels, n, block_size, mode, rnd
):
    """FLAC is lossless by definition: encode->decode must reproduce
    ANY int16 signal exactly — arbitrary lengths (incl. partial tail
    blocks), block sizes, both channel counts, every stereo mode."""
    import numpy as np

    from lms_erp_data_integration_spark.operators.flac import (
        decode_flac,
        encode_flac,
    )

    if channels == 1 and mode != "independent":
        mode = "independent"
    rng = np.random.default_rng(rnd.randrange(2**32))
    # mix of structured + noisy signals so every subframe type fires
    kind = rnd.randrange(4)
    if kind == 0:
        x = np.full((n, channels), rnd.randrange(-32768, 32768), np.int64)
    elif kind == 1:
        t = np.arange(n)[:, None]
        x = (
            (rnd.randrange(100, 20000))
            * np.sin(2 * np.pi * rnd.randrange(1, 300) * t / 8000)
        ).astype(np.int64) + rng.integers(-50, 50, (n, channels))
    else:
        x = rng.integers(-32768, 32767, (n, channels))
    x = np.clip(x, -32768, 32767)
    p = encode_flac(x, 8000, block_size=block_size, stereo_mode=mode)
    d = decode_flac(p)
    assert d is not None
    assert np.array_equal(d["samples"].astype(np.int64), x)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.randoms(use_true_random=False))
def test_dib_and_mp4raw_round_trip_property(w, h, rnd):
    import numpy as np

    from lms_erp_data_integration_spark.operators import avi
    from lms_erp_data_integration_spark.operators import multimodal as mm

    rng = np.random.default_rng(rnd.randrange(2**32))
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(
        avi.decode_dib_frame(avi.encode_dib_frame(rgb), w, h), rgb
    )
    assert np.array_equal(
        mm.decode_mp4_raw_frame(rgb.tobytes(), w, h), rgb
    )


# ------------------------------------------- r10: memorization spans


def test_memorization_spans_matches_python_reference(spark):
    """Seeded random corpus with PLANTED variable-length train slices
    inside eval docs: the operator's gaps-and-islands span measurement
    must equal a brute-force Python reference doc-for-doc (one Spark
    job; the 60-bit window hashes make accidental collisions
    negligible)."""
    from lms_erp_data_integration_spark.operators.dedup import (
        memorization_spans,
    )

    rng = random.Random(4242)
    vocab = [f"tok{i}" for i in range(5000)]

    def rand_tokens(n):
        return [rng.choice(vocab) for _ in range(n)]

    train = [(i, " ".join(rand_tokens(rng.randint(12, 60))))
             for i in range(30)]
    ev = []
    for i in range(20):
        toks = rand_tokens(rng.randint(4, 15))
        if i % 4 != 3:  # three in four eval docs embed a train slice
            src = train[rng.randrange(len(train))][1].split()
            ln = rng.randint(0, min(25, len(src)))
            start = rng.randint(0, len(src) - ln) if ln else 0
            toks += src[start:start + ln]
        toks += rand_tokens(rng.randint(4, 15))
        ev.append((100 + i, " ".join(toks)))

    span_n = 8
    train_windows = set()
    for _, text in train:
        t = text.split()
        for j in range(len(t) - span_n + 1):
            train_windows.add(" ".join(t[j:j + span_n]))
    expect = {}
    for did, text in ev:
        t = text.split()
        if len(t) < span_n:
            continue
        hits = [
            " ".join(t[j:j + span_n]) in train_windows
            for j in range(len(t) - span_n + 1)
        ]
        best = cur = n_hit = 0
        for h2 in hits:
            cur = cur + 1 if h2 else 0
            n_hit += int(h2)
            best = max(best, cur)
        span = best + span_n - 1 if best else 0
        expect[did] = (
            len(t), len(hits), n_hit, span, 1_000_000 * span // len(t)
        )

    train_df = spark.createDataFrame(train, "doc_id long, text string")
    ev_df = spark.createDataFrame(ev, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_windows"], r["n_hit_windows"],
            r["max_span_tokens"], r["memorized_ppm"],
        )
        for r in memorization_spans(
            train_df, ev_df, span_tokens=span_n
        ).collect()
    }
    assert got == expect
