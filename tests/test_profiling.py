"""Unified pre-flight profiling module: price the shuffle before
running it. The registered queries exercise these helpers against
DuckDB oracles; these unit tests pin the generic API on constructed
frames where the right answer is computable by hand."""

from __future__ import annotations

from lms_erp_data_integration_spark.operators import profiling


def test_join_size_profile_exact(spark):
    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k int"
    )  # counts: 1->2, 2->1, 3->1
    right = spark.createDataFrame(
        [(1,), (2,), (2,), (2,), (9,)], "k int"
    )  # counts: 1->1, 2->3, 9->1
    row = profiling.join_size_profile(left, right, "k", "k").first()
    # join rows: k=1 -> 2*1, k=2 -> 1*3  => 5; worst key contributes 3
    assert row["join_rows"] == 5
    assert row["matching_keys"] == 2
    assert row["max_key_rows"] == 3
    assert row["left_keys"] == 3
    assert row["right_keys"] == 3
    # the profile must be cheaper than the join: no row explosion
    assert "kk" not in profiling.join_size_profile(
        left, right, "k", "k"
    ).columns


def test_key_skew_profile_shares_and_order(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)], "key string"
    )
    rows = profiling.key_skew_profile(df, "key", top_k=2).collect()
    assert [r["key"] for r in rows] == ["a", "b"]
    assert rows[0]["n"] == 6 and rows[0]["share_ppm"] == 600_000
    assert rows[1]["share_ppm"] == 300_000
    assert all(r["n_distinct_keys"] == 3 for r in rows)


def test_bucket_sizes_and_histogram_agree(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("x", 3), ("y", 4), ("y", 5), ("z", 6)],
        "bucket string, doc int",
    )
    per_bucket = {
        r["bucket"]: r
        for r in profiling.bucket_sizes(df, ["bucket"]).collect()
    }
    assert per_bucket["x"]["bucket_size"] == 3
    assert per_bucket["x"]["candidate_pairs"] == 3  # 3*2/2
    assert per_bucket["z"]["candidate_pairs"] == 0
    hist = {
        r["bucket_size"]: r
        for r in profiling.bucket_size_histogram(df, ["bucket"]).collect()
    }
    assert hist[3]["n_buckets"] == 1 and hist[3]["candidate_pairs"] == 3
    assert hist[2]["n_buckets"] == 1 and hist[2]["candidate_pairs"] == 1
    assert hist[1]["n_buckets"] == 1 and hist[1]["candidate_pairs"] == 0
    # histogram totals must equal the per-bucket totals (same priced op)
    assert sum(r["candidate_pairs"] for r in per_bucket.values()) == sum(
        h["candidate_pairs"] * 1 for h in hist.values()
    )


def test_equi_width_histogram(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    rows = {
        r["bucket_id"]: r
        for r in profiling.equi_width_histogram(df, "v", buckets=10).collect()
    }
    # width = 9.9: bucket 0 gets [0, 9.9) = 10 values, last bucket
    # clamps the max in
    assert sum(r["n"] for r in rows.values()) == 100
    assert rows[0]["n"] == 10
    assert 9 in rows and rows[9]["n"] >= 1
    assert rows[0]["share_ppm"] == 100_000
    # degenerate all-equal column: everything lands in bucket 0
    one = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    got = profiling.equi_width_histogram(one, "v", buckets=10).collect()
    assert len(got) == 1 and got[0]["bucket_id"] == 0 and got[0]["n"] == 2
