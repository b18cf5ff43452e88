"""Literal-VALUES oracle parity guard (r8 verdict #1).

Every registry oracle that is a pure literal-VALUES SQL — no reference
to any data table, so the pinned rows ARE the expected output at every
scale factor — is executed in DuckDB and compared cell-for-cell
against the live Spark operator. This makes the r8 failure mode
(a hand-regenerated VALUES block drifting from the code that is
supposed to produce it, as happened to ``llm_decode_pixel_checksums``
id 50) structurally impossible: any re-stamp that doesn't match a
fresh operator run fails the suite before it can reach a driver round.
"""

from __future__ import annotations

import decimal
import re

import duckdb
import pytest

from lms_erp_data_integration_spark.plans import ORACLES, QUERIES

_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

# The self-contained oracles: literal VALUES, zero table references.
LITERAL_ORACLES = sorted(
    name
    for name, sql in ORACLES.items()
    if sql is not None
    and "VALUES" in sql.upper()
    and not any(re.search(rf"\b{t}\b", sql, re.I) for t in _TABLES)
)


def _norm(v):
    """Canonicalize a cell so DuckDB and Spark types compare equal."""
    if isinstance(v, decimal.Decimal):
        iv = int(v)
        return iv if v == iv else float(v)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float) and v == int(v):
        return int(v)
    return v


def test_literal_values_oracle_inventory():
    """The guard must keep covering the known literal-VALUES family;
    a new pinned-VALUES oracle joins this list automatically, but the
    existing ones may never silently drop out of it."""
    assert set(LITERAL_ORACLES) >= {
        "llm_decode_pixel_checksums",
        "llm_audio_decode_stats",
        "llm_warc_ingest_stats",
        "llm_video_frame_stats",
        "llm_video_codec_stats",
        "llm_video_ipp_stats",
        "llm_video_visual_dedup",
        "llm_image_visual_dedup",
    }


# Most literal-VALUES oracles are sf-independent (fixture payloads are
# generated from seeds, not read from sf_dir). The BPE pair pins the
# output of a real documents-table run at the DRIVER's correctness
# scale (sf0.01), so parity must be checked there.
_SF_PIN = {
    "llm_bpe_train_vocab": "/root/testdata/sf0.01",
    "llm_bpe_encode": "/root/testdata/sf0.01",
}


@pytest.mark.parametrize("name", LITERAL_ORACLES)
def test_literal_values_oracle_matches_operator(name, spark, sf_dir):
    """Pinned VALUES == fresh operator output, column-by-column the
    way the driver compares (columns sorted by name, rows as a
    multiset)."""
    sf_dir = _SF_PIN.get(name, sf_dir)
    rel = duckdb.sql(ORACLES[name])
    oracle_cols = list(rel.columns)
    oracle_rows = rel.fetchall()

    df = QUERIES[name](spark, sf_dir)
    got_cols = df.columns
    assert sorted(got_cols) == sorted(oracle_cols), (
        f"{name}: column mismatch {got_cols} vs {oracle_cols}"
    )
    order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
    want = sorted(
        tuple(_norm(r[i]) for i in order) for r in oracle_rows
    )
    gidx = {c: i for i, c in enumerate(got_cols)}
    gorder = [gidx[oracle_cols[i]] for i in order]
    got = sorted(
        tuple(_norm(r[i]) for i in gorder) for r in df.collect()
    )
    assert got == want, f"{name}: VALUES block drifted from operator"
