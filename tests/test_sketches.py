"""Sketch-operator invariants (operators/sketches.py): HLL accuracy,
duplicate-insensitivity and mergeability; Count-Min's one-sided error;
Bloom's no-false-negative guarantee — plus query-level runs of the
three registered sketch queries at sf0.001."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lms_erp_data_integration_spark.operators import sketches as sk
from lms_erp_data_integration_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _values_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "val string")


def test_hll_estimate_within_standard_error(spark):
    n = 5000
    df = _values_df(spark, [f"item-{i}" for i in range(n)])
    regs = sk.hll_registers(df.select(F.lit("g").alias("g"), "val"),
                            F.col("val"), "g")
    row = sk.hll_estimate_row(regs, "g").collect()[0]
    # sigma = 1.04 / sqrt(m); allow 3 sigma
    sigma = 1.04 / math.sqrt(sk.HLL_M)
    assert abs(row["hll_estimate"] - n) / n < 3 * sigma
    assert row["n_nonzero"] + row["n_zero"] == sk.HLL_M


def test_hll_registers_duplicate_insensitive(spark):
    vals = [f"tok-{i}" for i in range(300)]
    once = _values_df(spark, vals)
    thrice = _values_df(spark, vals * 3)
    r1 = sorted(
        sk.hll_registers(
            once.select(F.lit("g").alias("g"), "val"), F.col("val"), "g"
        ).collect()
    )
    r3 = sorted(
        sk.hll_registers(
            thrice.select(F.lit("g").alias("g"), "val"), F.col("val"), "g"
        ).collect()
    )
    assert r1 == r3


def test_hll_merge_equals_union(spark):
    a = [f"a-{i}" for i in range(400)]
    b = [f"b-{i}" for i in range(400)]
    half_a = _values_df(spark, a).select(F.lit("g").alias("g"), "val")
    half_b = _values_df(spark, b).select(F.lit("g").alias("g"), "val")
    both = _values_df(spark, a + b).select(F.lit("g").alias("g"), "val")
    merged = (
        sk.hll_registers(half_a, F.col("val"), "g")
        .unionByName(sk.hll_registers(half_b, F.col("val"), "g"))
        .groupBy("g", "reg_idx")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    direct = sk.hll_registers(both, F.col("val"), "g")
    assert sorted(merged.collect()) == sorted(direct.collect())


def test_cms_never_underestimates(spark):
    vals = ["x"] * 50 + ["y"] * 7 + [f"noise-{i}" for i in range(500)]
    df = _values_df(spark, vals)
    cells = sk.cms_cells(df, F.col("val"))
    # the cell domain is bounded by d x w
    assert cells.count() <= sk.CMS_D * sk.CMS_W
    probes = _values_df(spark, ["x", "y", "absent"]).select(
        F.col("val").alias("token")
    )
    est = {
        r["token"]: r["cms_estimate"]
        for r in sk.cms_probe(cells, probes, "token").collect()
    }
    assert est["x"] >= 50 and est["y"] >= 7 and est["absent"] >= 0


def test_bloom_has_no_false_negatives(spark):
    dim = _values_df(spark, [str(i) for i in range(0, 100, 2)])
    bits = (
        sk.bloom_positions(dim, F.col("val"), "k")
        .select("pos")
        .distinct()
    )
    probe_keys = _values_df(spark, [str(i) for i in range(100)])
    probe = sk.bloom_positions(probe_keys, F.col("val"), "k")
    passed = {
        r["k"]
        for r in probe.join(bits, "pos", "left_semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == sk.BLOOM_K)
        .collect()
    }
    members = {str(i) for i in range(0, 100, 2)}
    assert members <= passed  # every member passes


def test_hll_rollup_lattice_consistency(spark):
    """Every coarser grain is a max-merge of finer ones, so its
    inverse-power sum can only shrink (estimate can only grow); and
    the grand-total registers must equal the '__all__' row of the
    per-source query — same token set, different lattice path."""
    rollup = {
        (r["source"], r["lang"]): r
        for r in QUERIES["llm_sketch_hll_rollup"](spark, SF_DIR).collect()
    }
    for (src, lang), r in rollup.items():
        if src != "*" and lang != "*":
            assert rollup[(src, "*")]["inv_power_sum"] <= r["inv_power_sum"]
            assert rollup[("*", lang)]["inv_power_sum"] <= r["inv_power_sum"]
        if (src, lang) != ("*", "*"):
            assert (
                rollup[("*", "*")]["inv_power_sum"] <= r["inv_power_sum"]
            )
    flat = {
        r["source"]: r
        for r in QUERIES["llm_sketch_hll_distinct"](spark, SF_DIR).collect()
    }
    assert (
        rollup[("*", "*")]["register_checksum"]
        == flat["__all__"]["register_checksum"]
    )
    assert (
        rollup[("*", "*")]["inv_power_sum"]
        == flat["__all__"]["inv_power_sum"]
    )


@pytest.mark.parametrize(
    "name",
    [
        "llm_sketch_hll_distinct",
        "llm_sketch_cms_heavy_hitters",
        "rel_bloom_semi_join",
    ],
)
def test_sketch_queries_invariants(spark, name):
    rows = QUERIES[name](spark, SF_DIR).collect()
    assert rows
    if name == "llm_sketch_hll_distinct":
        by_src = {r["source"]: r for r in rows}
        assert "__all__" in by_src
        # register-wise max merge => S_all <= every per-source S
        # => est_all >= every per-source estimate
        for src, r in by_src.items():
            assert r["n_nonzero"] + r["n_zero"] == sk.HLL_M
            if src != "__all__":
                assert (
                    by_src["__all__"]["inv_power_sum"]
                    <= r["inv_power_sum"]
                )
                assert (
                    by_src["__all__"]["hll_estimate"]
                    >= r["hll_estimate"]
                )
    elif name == "llm_sketch_cms_heavy_hitters":
        assert {r["token"] for r in rows} == {
            "the", "of", "and", "data", "course", "zz_never_a_token",
        }
        for r in rows:
            assert r["overestimate"] >= 0  # one-sided error, always
            assert r["cms_estimate"] == r["exact_count"] + r["overestimate"]
    else:
        (r,) = rows
        assert r["n_false_positive"] >= 0  # no false negatives
        assert r["n_bloom_pass"] >= r["n_exact"]
        assert r["n_orders"] >= r["n_bloom_pass"]
        assert r["fp_ppm"] >= 0


# ------------------------------------------------------------ KMV / Theta


def test_kmv_sketch_pruned_matches_unpruned(spark):
    df = _values_df(spark, [f"v-{i}" for i in range(4000)]).select(
        F.lit("g").alias("g"), "val"
    )
    pruned = sorted(
        (r["h"], r["r"])
        for r in sk.kmv_sketch(df, F.col("val"), "g").collect()
    )
    full = sorted(
        (r["h"], r["r"])
        for r in sk.kmv_sketch(df, F.col("val"), "g", prune=False).collect()
    )
    assert pruned == full
    assert len(pruned) == sk.KMV_K


def test_kmv_estimate_accuracy_and_exact_branch(spark):
    # exact branch: fewer distinct values than k -> theta = 2^60,
    # sketch IS the set
    small = _values_df(spark, [f"s-{i}" for i in range(100)] * 3).select(
        F.lit("g").alias("g"), "val"
    )
    th = sk.kmv_theta(
        sk.kmv_sketch(small, F.col("val"), "g"), "g"
    ).collect()[0]
    assert th["cnt"] == 100 and th["theta"] == 1 << 60
    # estimator branch: 3-sigma KMV bound sigma ~ 1/sqrt(k-2)
    n = 20000
    big = _values_df(spark, [f"b-{i}" for i in range(n)]).select(
        F.lit("g").alias("g"), "val"
    )
    row = sk.kmv_theta(
        sk.kmv_sketch(big, F.col("val"), "g"), "g"
    ).collect()[0]
    est = (sk.KMV_K - 1) * (1 << 60) / row["theta"]
    assert abs(est - n) / n < 3 / math.sqrt(sk.KMV_K - 2)


def test_theta_setops_query_estimates_track_exact(spark):
    rows = QUERIES["rel_theta_setops"](spark, SF_DIR).collect()
    assert len(rows) == 3  # (95,96) (95,97) (96,97)
    for r in rows:
        assert r["exact_union"] == r["exact_a"] + r["exact_b"] - r["exact_intersect"]
        # sf0.001 years hold < k distinct customers: sketch = exact set,
        # so every estimate must be EXACT
        assert r["est_a"] == float(r["exact_a"])
        assert r["est_b"] == float(r["exact_b"])
        assert r["est_intersect"] == float(r["exact_intersect"])
        assert r["est_union"] == float(r["exact_union"])


def test_bottomk_sample_pruned_matches_unpruned_and_merges(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i, float(i) * 1.5) for i in range(4000)],
        "grp string, k long, v double",
    )
    pruned = sorted(
        (r["grp"], r["k"], r["r"])
        for r in sk.bottomk_sample(df, F.col("k"), "grp").collect()
    )
    full = sorted(
        (r["grp"], r["k"], r["r"])
        for r in sk.bottomk_sample(
            df, F.col("k"), "grp", prune=False
        ).collect()
    )
    assert pruned == full
    assert len(pruned) == 3 * sk.SAMPLE_K
    # merge property: re-trimming the union of per-group samples by
    # hash rank IS the global bottom-k sample of the whole input
    samp = sk.bottomk_sample(df, F.col("k"), "grp")
    merged = set(
        r["k"]
        for r in samp.orderBy("h", "k").limit(sk.SAMPLE_K).collect()
    )
    direct = set(
        r["k"]
        for r in sk.bottomk_sample(
            df.withColumn("grp", F.lit("*")), F.col("k"), "grp"
        ).collect()
    )
    assert merged == direct


def test_sample_quantiles_exact_when_group_fits(spark):
    # a group smaller than k: the sample IS the group, so estimated
    # order statistics must equal the exact ones
    vals = [(f"g", i, float((i * 37) % 101)) for i in range(sk.SAMPLE_K - 6)]
    df = spark.createDataFrame(vals, "grp string, k long, v double")
    samp = sk.bottomk_sample(df, F.col("k"), "grp")
    est = sk.sample_quantiles(
        samp, "v", F.col("k"), [25, 50, 75, 95], "grp", prefix="est"
    ).collect()[0]
    ex = sk.sample_quantiles(
        df, "v", F.col("k"), [25, 50, 75, 95], "grp", prefix="exact"
    ).collect()[0]
    assert est["est_n"] == ex["exact_n"] == sk.SAMPLE_K - 6
    for p in (25, 50, 75, 95):
        assert est[f"est_p{p}"] == ex[f"exact_p{p}"]
    # the lower order statistic at integer rank arithmetic: p50 of
    # 0..n-1 permuted values is the element at rank (50*(n-1))//100+1
    srt = sorted(v for _, _, v in vals)
    assert ex["exact_p50"] == srt[(50 * (len(vals) - 1)) // 100]


def test_quantile_sketch_query_estimates_bracket_exact(spark):
    # the audit row carries the exact columns; the production row's
    # sketch columns must agree with it cell-for-cell (r8 verdict #3
    # split: same sketch path, audit-only difference)
    rows = QUERIES["rel_quantile_sketch_audit"](spark, SF_DIR).collect()
    by_grp = {r["grp"]: r for r in rows}
    assert "*" in by_grp and len(rows) == 6
    star = by_grp["*"]
    assert star["n_rows"] == sum(
        r["n_rows"] for g, r in by_grp.items() if g != "*"
    )
    for r in rows:
        assert r["sample_k"] == min(sk.SAMPLE_K, r["n_rows"])
        # sampled order statistics are real data points in range
        for p in (25, 50, 75, 95):
            assert r["exact_p25"] <= r[f"est_p{p}"] or p == 25
        assert r["est_p25"] <= r["est_p50"] <= r["est_p75"] <= r["est_p95"]
        assert r["exact_p25"] <= r["exact_p50"] <= r["exact_p95"]
    prod = {
        r["grp"]: r
        for r in QUERIES["rel_quantile_sketch"](spark, SF_DIR).collect()
    }
    assert set(prod) == set(by_grp)
    for g, r in prod.items():
        assert r["sample_k"] == by_grp[g]["sample_k"]
        for p in (25, 50, 75, 95):
            assert r[f"est_p{p}"] == by_grp[g][f"est_p{p}"]


def test_quantile_sampled_audit_within_bound_and_slice_sized(spark, sf_dir):
    """The sampled-slice audit's contract at gate scale: every
    (grain, percentile) verdict is within the stated 2-sigma bound,
    the slice is ~1/QSK_SLICE_MOD of each grain (hash-uniform), and
    the error column is consistent with the rank column."""
    from lms_erp_data_integration_spark.plans.sketch_queries import (
        QSK_SLICE_MOD,
        quantile_sketch_audit_sampled,
    )

    rows = quantile_sketch_audit_sampled(spark, sf_dir).collect()
    assert len(rows) == 24  # (5 priorities + '*') x 4 percentiles
    assert all(r.within_bound == 1 for r in rows)
    for r in rows:
        assert r.err_ppm == abs(r.slice_rank_ppm - r.pct * 10_000)
        assert r.bound_ppm > 125_000  # sketch term + positive slice term
    # hash slice is unbiased: '*' grain holds ~n/8 of orders
    star = next(r for r in rows if r.grp == "*")
    full = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert abs(star.n_slice - full / QSK_SLICE_MOD) < full * 0.02
