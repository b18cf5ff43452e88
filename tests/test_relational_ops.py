"""asof_join and salted_join unit tests."""

from __future__ import annotations

from lms_erp_data_integration_spark.operators.relational import asof_join, salted_join
from pyspark.sql import functions as F


def test_asof_join_basic(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0), ("A", 5, 99.0)],
        "sym string, t long, px double",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 1.0), ("A", 12, 2.0), ("A", 20, 3.0), ("B", 99, 9.0)],
        "sym string, t long, bid double",
    )
    out = asof_join(trades, quotes, "sym", "t", "t", ["bid"])
    got = {(r["sym"], r["t"]): r["bid"] for r in out.collect()}
    assert got == {
        ("A", 5): None,  # no quote at or before t=5
        ("A", 10): 1.0,  # quote at 8
        ("A", 20): 3.0,  # tie t=20 -> inclusive (right sorts first)
        ("B", 15): None,  # B's only quote is later
    }


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    lpdf = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200),
            "t": rng.randint(0, 1000, 200).astype("int64"),
        }
    ).drop_duplicates(["k", "t"])
    rpdf = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 100),
            "t": rng.randint(0, 1000, 100).astype("int64"),
            "v": rng.rand(100),
        }
    ).drop_duplicates(["k", "t"])
    expected = pd.merge_asof(
        lpdf.sort_values("t"), rpdf.sort_values("t"), on="t", by="k"
    )
    out = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        "k",
        "t",
        "t",
        ["v"],
    ).toPandas()
    e = {(r.k, r.t): r.v for r in expected.itertuples()}
    g = {(r.k, r.t): r.v for r in out.itertuples()}
    assert set(e) == set(g)
    for key, ev in e.items():
        gv = g[key]
        assert (pd.isna(ev) and pd.isna(gv)) or ev == gv


def test_salted_join_equals_plain_join(spark):
    # skewed: 90% of left rows share one key
    left = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (10, "ten"), (20, "twenty")], "k long, rv string"
    )
    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", salt=4).select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert salted.count() == 900 + 2  # hot key 900 rows + ids 10, 20


# ---------------------------------------------- r5: interval sweep line


def test_interval_max_concurrency_hand_example(spark):
    import datetime as dt

    from lms_erp_data_integration_spark.operators.relational import (
        interval_max_concurrency,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def iv(key, s_off, e_off):
        return (
            key,
            t0 + dt.timedelta(minutes=s_off),
            t0 + dt.timedelta(minutes=e_off),
        )

    df = spark.createDataFrame(
        [
            # key a: 3 overlapping at minute 2.5; back-to-back at 10
            iv("a", 0, 5),
            iv("a", 1, 4),
            iv("a", 2, 3),
            iv("a", 5, 10),   # half-open: [0,5) and [5,10) never overlap
            iv("a", 10, 11),
            # key b: disjoint
            iv("b", 0, 1),
            iv("b", 2, 3),
        ],
        ["k", "s", "e"],
    )
    out = {
        r["k"]: r for r in interval_max_concurrency(df, "k", "s", "e").collect()
    }
    assert out["a"]["n_intervals"] == 5
    assert out["a"]["max_concurrent"] == 3
    assert out["b"]["n_intervals"] == 2
    assert out["b"]["max_concurrent"] == 1


def test_interval_max_concurrency_bucket_boundary(spark):
    import datetime as dt

    from lms_erp_data_integration_spark.operators.relational import (
        interval_max_concurrency,
    )

    # intervals spanning the day-bucket boundary: the two-phase offset
    # must carry still-open intervals into the next bucket
    d1 = dt.datetime(2024, 1, 1, 23, 0)
    d2 = dt.datetime(2024, 1, 2, 1, 0)
    df = spark.createDataFrame(
        [
            ("k", d1, d2),                                   # open across midnight
            ("k", d1 + dt.timedelta(minutes=30), d2),         # also open
            ("k", dt.datetime(2024, 1, 2, 0, 30), d2),        # starts day 2
        ],
        ["k", "s", "e"],
    )
    out = interval_max_concurrency(df, "k", "s", "e").collect()[0]
    assert out["n_intervals"] == 3
    assert out["max_concurrent"] == 3  # all three open at 00:30 day 2
