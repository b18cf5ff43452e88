from __future__ import annotations

import pytest

from lms_erp_data_integration_spark.functions import (
    current_term_id,
    next_term_id,
    resolve_term,
    term_successor_expr,
)
from pyspark.sql import functions as F


@pytest.mark.parametrize(
    ("term", "nxt"),
    [
        ("211S", "212S"),  # 1S -> same year 2S (integrator.py:27-36)
        ("212S", "221S"),  # 2S -> next year 1S
        ("092S", "101S"),  # zero-padded year
        ("992S", "1001S"),  # int rollover, no truncation
    ],
)
def test_next_term_id(term, nxt):
    assert next_term_id(term) == nxt


def test_current_term_trims_padding(spark):
    # REG_CONFIG fixture with padded values (FIXTURES.md C; jenzabar.py:24-26)
    df = spark.createDataFrame(
        [("21 ", "1S ")], "CUR_YR_DFLT string, CUR_TRM_DFLT string"
    )
    assert current_term_id(df) == "211S"
    assert resolve_term(df, "current") == "211S"
    assert resolve_term(df, "next") == "212S"


def test_term_successor_expr_matches_python(spark):
    terms = ["211S", "212S", "092S", "991S", "992S"]
    df = spark.createDataFrame([(t,) for t in terms], "term_id string")
    got = {
        r["term_id"]: r["nxt"]
        for r in df.withColumn("nxt", term_successor_expr(F.col("term_id"))).collect()
    }
    assert got == {t: next_term_id(t) for t in terms}
