"""Distributed logistic-regression quality classifier
(operators/quality_ml.py): exact-integer determinism and learning."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lms_erp_data_integration_spark.catalog import Catalog
from lms_erp_data_integration_spark.operators.quality_ml import (
    _tdiv,
    feature_frame,
    train_quality_logreg,
)

SF_DIR = "/root/testdata/sf0.01"


def test_tdiv_matches_duckdb_truncation():
    import duckdb

    for a, b in ((-7, 2), (7, 2), (-1, 3), (0, 5), (-100001, 7)):
        got = duckdb.sql(f"SELECT {a} // {b}").fetchone()[0]
        assert _tdiv(a, b) == got, (a, b)


def test_feature_frame_label_rule(spark):
    df = spark.createDataFrame(
        [
            # 24 tokens, 6 stopwords -> ratio 25% -> positive
            (1, "the a of and to in " + "word " * 17 + "tail"),
            # long but zero stopwords -> negative
            (2, "word " * 30 + "tail"),
            # stopword-rich but too short -> negative
            (3, "the a of and"),
        ],
        "doc_id long, text string",
    )
    rows = {i: r for i, r in enumerate(feature_frame(df).collect())}
    assert [rows[i]["y"] for i in range(3)] == [1, 0, 0]
    assert rows[0]["f0"] == 1_000_000
    assert rows[0]["f1"] == 6 * 1_000_000 // 24
    assert rows[1]["f1"] == 0


def test_training_deterministic_and_learns(spark):
    docs = Catalog(spark, SF_DIR).documents
    a = train_quality_logreg(docs).first().asDict()
    # bit-identical under a different partitioning (the exact-integer
    # gradient contract)
    b = train_quality_logreg(docs.repartition(17)).first().asDict()
    assert a == b
    # the model actually separates: >= 85% training accuracy and both
    # classes predicted
    acc = (a["tp"] + a["tn"]) / a["n_docs"]
    assert acc >= 0.85, a
    assert a["tp"] > 0 and a["tn"] > 0
    # stopword ratio is the rule's main signal -> largest learned
    # weight, positive
    assert a["w1"] > 0 and a["w1"] >= max(abs(a["w2"]), abs(a["w3"]))


def test_quality_psi_invariants_and_self_psi_zero(spark, sf_dir):
    """PSI contract: every source emits exactly 10 bucket rows, each
    term is non-negative ((src-ref) and ln(src/ref) share sign), the
    verdict matches the threshold — and a corpus compared against
    itself (one source) has PSI exactly 0 in every bucket."""
    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.catalog import Catalog
    from lms_erp_data_integration_spark.plans.curation_queries import (
        PSI_DRIFT_MICRO,
        quality_psi_by_source,
        quality_psi_report,
    )

    rows = quality_psi_by_source(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert sorted(x.bucket for x in rs) == list(range(1, 11)), src
        assert all(x.psi_term_micro >= 0 for x in rs)
        total = sum(x.psi_term_micro for x in rs)
        assert all(x.psi_total_micro == total for x in rs)
        assert all(
            x.drifted == int(total >= PSI_DRIFT_MICRO) for x in rs
        )

    one = Catalog(spark, sf_dir).documents.withColumn(
        "source", F.lit("all")
    )
    self_rows = quality_psi_report(one).collect()
    assert len(self_rows) == 10
    assert all(r.psi_term_micro == 0 and r.drifted == 0 for r in self_rows)


def test_psi_score_equals_quality_f1(spark, sf_dir):
    """The identity the capstone's r13 shared-persist trim rests on:
    the PSI drift score (stopword-ratio ppm over whitespace tokens,
    ``psi_score_frame``) equals the quality feature f1
    (``quality_ml.feature_frame``) for EVERY document — lowercasing
    before vs after a whitespace split is equivalent, and both sides
    use the same integer div. If either definition drifts, the
    capstone's PSI leg (fed from the persisted feature frame) would
    silently diverge from the oracle's — this pins it loudly."""
    from lms_erp_data_integration_spark.catalog import Catalog
    from lms_erp_data_integration_spark.operators.quality_ml import (
        feature_frame,
    )
    from lms_erp_data_integration_spark.plans.curation_queries import (
        psi_score_frame,
    )

    docs = Catalog(spark, sf_dir).documents
    f = feature_frame(docs, keep=("doc_id",)).select(
        "doc_id", F.col("f1").alias("a")
    )
    s = psi_score_frame(docs).select("doc_id", F.col("score").alias("b"))
    diff = f.join(s, "doc_id").where(F.col("a") != F.col("b")).count()
    assert diff == 0


def test_quality_psi_gate_both_decision_branches(spark, sf_dir):
    """Both branches of the PSI drift gate on the real corpus: a
    generous line retains every document, an impossible line
    quarantines every source (empty curated corpus), and at the
    production PSI_DRIFT_MICRO line the gate is exactly the monitor's
    complement — retained sources are the drifted=0 sources, each
    retained doc carries its source's monitor PSI total, and a
    quarantined source contributes zero rows."""
    from lms_erp_data_integration_spark.catalog import Catalog
    from lms_erp_data_integration_spark.plans.curation_queries import (
        quality_psi_by_source,
        quality_psi_gate_frame,
    )

    docs = Catalog(spark, sf_dir).documents
    n_docs = docs.count()

    assert quality_psi_gate_frame(docs, drift_micro=10**12).count() == n_docs
    assert quality_psi_gate_frame(docs, drift_micro=0).count() == 0

    monitor = {
        r.source: r
        for r in quality_psi_by_source(spark, sf_dir).collect()
    }
    kept = quality_psi_gate_frame(docs).collect()
    kept_sources = {r.source for r in kept}
    expected_kept = {s for s, r in monitor.items() if r.drifted == 0}
    assert kept_sources == expected_kept

    # a data-derived mid line splits the sources, so both branches are
    # live in ONE run regardless of how drifted this corpus slice is
    # (at sf0.001 every 25-doc source reads over the standard line —
    # the monitor's documented small-slice caveat)
    totals = sorted(r.psi_total_micro for r in monitor.values())
    mid = totals[len(totals) // 2]
    kept_mid = quality_psi_gate_frame(docs, drift_micro=mid).collect()
    mid_sources = {r.source for r in kept_mid}
    assert mid_sources == {
        s for s, r in monitor.items() if r.psi_total_micro < mid
    }
    assert mid_sources and set(monitor) - mid_sources
    assert all(
        r.psi_total_micro == monitor[r.source].psi_total_micro
        for r in kept_mid
    )
    per_source = docs.groupBy("source").count().collect()
    expected_rows = sum(
        r["count"] for r in per_source if r.source in mid_sources
    )
    assert len(kept_mid) == expected_rows


def test_quality_calibrated_gate_both_decision_branches(spark, sf_dir):
    """Both decision branches of the quality calibrate->gate
    composition on the real corpus: a zero precision floor qualifies
    every sweep point (met_floor = 1, chosen = global argmax-F1); an
    impossible floor falls back to the same global argmax-F1 point
    with met_floor = 0. Also pins the composition's consistency
    contract: the kept set is exactly the scored docs at/above the
    chosen threshold, and its size equals tp + fp at that curve row."""
    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.catalog import Catalog
    from lms_erp_data_integration_spark.operators.quality_ml import (
        MICRO,
        _p_micro_expr,
        fit_quality_logreg,
    )
    from lms_erp_data_integration_spark.plans.curation_queries import (
        quality_calibrated_gate_frame,
        quality_curve_frame,
    )

    docs = Catalog(spark, sf_dir).documents
    feats, w, means, _n = fit_quality_logreg(docs, keep=("doc_id",))
    curve = {
        int(r["threshold_micro"]): r
        for r in quality_curve_frame(feats, w, means).collect()
    }
    best = sorted(
        curve.values(),
        key=lambda r: (-int(r["f1_micro"]), int(r["threshold_micro"])),
    )[0]

    g = quality_calibrated_gate_frame(docs, floor_micro=0).collect()
    assert g and all(r.met_floor == 1 for r in g)
    th = g[0].chosen_threshold_micro
    assert th == int(best["threshold_micro"])
    # kept set == scored docs at/above the chosen threshold
    expected = {
        r.doc_id: r.p
        for r in feats.select(
            "doc_id", _p_micro_expr(w, means).alias("p")
        ).collect()
        if r.p >= th
    }
    assert {r.doc_id: r.p_micro for r in g} == expected
    # |kept| == tp + fp at the chosen curve row
    assert len(g) == int(curve[th]["tp"]) + int(curve[th]["fp"])

    f = quality_calibrated_gate_frame(
        docs, floor_micro=2 * MICRO
    ).collect()
    assert f and all(r.met_floor == 0 for r in f)
    # fallback is the global argmax-F1 point — same chosen threshold
    assert f[0].chosen_threshold_micro == th
    assert {r.doc_id for r in f} == set(expected)


def test_corpus_curate_calibrated_stage_identity_and_consistency(
    spark, sf_dir
):
    """The composed calibrated-curation row must (a) partition the
    corpus exactly (n_docs = n_fail_quality + n_drift_dropped +
    n_dup_dropped + n_kept), (b) agree with each family row it
    composes on the chosen operating points and the per-stage sets,
    and (c) attribute drift drops only when the drift line actually
    splits the sources (driven via a data-derived mid line, since at
    tiny slices every source drifts and n_kept is legitimately 0)."""
    from lms_erp_data_integration_spark.catalog import Catalog
    from lms_erp_data_integration_spark.plans.curation_queries import (
        corpus_curate_calibrated_frame,
        quality_calibrated_gate_frame,
        quality_psi_report,
    )
    from lms_erp_data_integration_spark.plans.llm_queries import (
        _pairs_at_sweep_floor,
        dedup_calibrated_apply_frame,
    )

    docs = Catalog(spark, sf_dir).documents
    n_total = docs.count()

    totals = sorted(
        r.psi_total_micro
        for r in quality_psi_report(docs)
        .groupBy("source")
        .agg(F.max("psi_total_micro").alias("psi_total_micro"))
        .collect()
    )
    mid = int(totals[len(totals) // 2])

    g = corpus_curate_calibrated_frame(
        spark, docs, drift_micro=mid
    ).collect()
    assert len(g) == 1
    g = g[0]
    # (a) exact partition of the corpus
    assert g.n_docs == n_total
    assert (
        g.n_fail_quality + g.n_drift_dropped + g.n_dup_dropped + g.n_kept
        == g.n_docs
    )
    assert g.n_drift_dropped > 0 and g.n_kept > 0

    # (b) chosen points agree with the family rows
    gate = quality_calibrated_gate_frame(docs).collect()
    assert g.quality_threshold_micro == gate[0].chosen_threshold_micro
    assert g.quality_met_floor == gate[0].met_floor
    assert g.n_fail_quality == n_total - len(gate)

    st = _pairs_at_sweep_floor(docs).persist()
    try:
        ap = dedup_calibrated_apply_frame(spark, st, docs).collect()[0]
        assert g.dedup_threshold_pct == ap.chosen_threshold_pct
        assert g.dedup_within_budget == ap.within_budget
        # the composition's dup drops are the apply row's drop SET
        # restricted to quality+drift survivors — never more
        assert g.n_dup_dropped <= ap.apply_n_dropped
    finally:
        st.unpersist()
