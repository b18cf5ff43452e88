"""pagerank_micros unit tests (exact integer recurrence)."""

from __future__ import annotations

from lms_erp_data_integration_spark.operators.graph import pagerank_micros


def test_pagerank_two_node_cycle(spark):
    # a <-> b: symmetric, deg 1 each. Every iteration maps r -> 150000
    # + (85 * r) // 100; from 1_000_000: 1_000_000 -> 1_000_000 (fixed
    # point of the scaled recurrence).
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r["node"]: r["r"] for r in pagerank_micros(edges, 3).collect()}
    assert got == {"a": 1_000_000, "b": 1_000_000}


def test_pagerank_star_hand_computed(spark):
    # hub h links to s1..s3 and back (symmetric star). deg(h)=3,
    # deg(s)=1. r0 = 1_000_000 each.
    # iter: h gets sum of three spokes' r div 1; s gets r(h) div 3.
    edges = spark.createDataFrame(
        [("h", "s1"), ("h", "s2"), ("h", "s3"),
         ("s1", "h"), ("s2", "h"), ("s3", "h")],
        "src string, dst string",
    )

    def step(rh, rs):
        nh = 150_000 + (85 * (3 * rs)) // 100
        ns = 150_000 + (85 * (rh // 3)) // 100
        return nh, ns

    rh, rs = 1_000_000, 1_000_000
    for _ in range(3):
        rh, rs = step(rh, rs)
    got = {r["node"]: r["r"] for r in pagerank_micros(edges, 3).collect()}
    assert got == {"h": rh, "s1": rs, "s2": rs, "s3": rs}


def test_pagerank_integer_division_truncates(spark):
    # deg(h)=3 with rank not divisible by 3: contributions use exact
    # integer div (floor), matching the SQL oracle's // semantics.
    edges = spark.createDataFrame(
        [("h", "s1"), ("h", "s2"), ("h", "s3"),
         ("s1", "h"), ("s2", "h"), ("s3", "h")],
        "src string, dst string",
    )
    out = {r["node"]: r["r"] for r in pagerank_micros(edges, 1).collect()}
    assert out["s1"] == 150_000 + (85 * (1_000_000 // 3)) // 100


def test_pagerank_provided_degrees_matches_derived(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (2, 3), (3, 1)], "src long, dst long"
    )
    from pyspark.sql import functions as F

    degrees = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    derived = sorted(map(tuple, pagerank_micros(edges, 3).collect()))
    provided = sorted(
        map(tuple, pagerank_micros(edges, 3, degrees=degrees).collect())
    )
    assert derived == provided


def test_pagerank_dangling_mass_hand_computed(spark):
    """1->2, 2->3, 3 is a sink. n=3, all start at 1e6 micro.
    Round 1: dangling = r(3) = 1e6, share = 1e6 div 3 = 333333;
      r(1) = 150000 + (85 *  333333) div 100            =  433333
      r(2) = 150000 + (85 * (1000000 + 333333)) div 100 = 1283333
      r(3) = r(2)                                       = 1283333
    Total 2999999 — mass conserved up to div truncation (< n micro)."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        r["node"]: r["r"]
        for r in pagerank_micros(
            edges, iterations=1, handle_dangling=True
        ).collect()
    }
    assert got == {1: 433333, 2: 1283333, 3: 1283333}
    assert sum(got.values()) == 2999999


def test_pagerank_dangling_noop_on_sinkless_graph(spark):
    """With no sinks the dangling share is zero every round, so the
    full formulation must equal the fast path exactly."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1)], "src long, dst long"
    )
    fast = dict(
        (r["node"], r["r"]) for r in pagerank_micros(edges, 3).collect()
    )
    full = dict(
        (r["node"], r["r"])
        for r in pagerank_micros(edges, 3, handle_dangling=True).collect()
    )
    assert fast == full


def test_triangle_count_known_graph(spark):
    """K4 plus a pendant: C(4,3)=4 triangles, counted once each under
    degree orientation regardless of skewed degrees."""
    from lms_erp_data_integration_spark.operators.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], "u long, v long")
    row = triangle_count(edges).first()
    assert row["triangles"] == 4
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    # triangle-free graph: a star (all wedges, no closures)
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "u long, v long"
    )
    assert triangle_count(star).first()["triangles"] == 0
