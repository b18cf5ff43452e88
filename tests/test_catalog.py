"""Catalog schema contracts: exact expected types for the driver's
tables — guards against silent schema drift (the engine declares, never
infers; SURVEY.md section 1.2)."""

from __future__ import annotations

import pytest

from lms_erp_data_integration_spark.catalog import Catalog, TABLES

EXPECTED = {
    "region": "struct<r_regionkey:int,r_name:string>",
    "nation": "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer": (
        "struct<c_custkey:bigint,c_name:string,c_nationkey:int,"
        "c_acctbal:double,c_mktsegment:string>"
    ),
    "supplier": (
        "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>"
    ),
    "part": (
        "struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string,"
        "p_size:int,p_retailprice:double>"
    ),
    "orders": (
        "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
        "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string>"
    ),
    "lineitem": (
        "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,"
        "l_linenumber:int,l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_tax:double,l_returnflag:string,"
        "l_linestatus:string,l_shipdate:timestamp_ntz>"
    ),
    # ts converted nanos->micros by the Catalog (session TZ = UTC)
    "events": (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    ),
    "documents": (
        "struct<doc_id:bigint,text:string,lang:string,source:string,"
        "n_chars:bigint>"
    ),
    "embeddings": "struct<vec_id:bigint,embedding:array<float>,label:int>",
}


@pytest.mark.parametrize("table", TABLES)
def test_table_schema(spark, sf_dir, table):
    got = Catalog(spark, sf_dir).table(table).schema.simpleString()
    assert got == EXPECTED[table], f"{table}: {got}"


def test_max_result_size_mb_accepts_all_spark_suffix_forms():
    """Spark's JavaUtils accepts k/m/g/t AND kb/mb/gb/tb (any case)
    for spark.driver.memory; the maxResultSize derivation must parse
    every form it passes through, and fall back to the stock 1 GiB
    guard — never crash the session build — on unparseable input."""
    from lms_erp_data_integration_spark.session import _max_result_size_mb

    assert _max_result_size_mb("48g") == 8 * 1024          # capped
    assert _max_result_size_mb("48gb") == 8 * 1024         # two-letter
    assert _max_result_size_mb("48GB") == 8 * 1024         # any case
    assert _max_result_size_mb("12g") == 2 * 1024          # heap/6
    assert _max_result_size_mb("12288m") == 2 * 1024
    assert _max_result_size_mb("12288mb") == 2 * 1024
    assert _max_result_size_mb("4g") == 1024               # floored
    assert _max_result_size_mb(str(12 * 1024**3)) == 2 * 1024  # bytes
    assert _max_result_size_mb("") == 1024                 # fallback
    assert _max_result_size_mb("oops") == 1024             # fallback
    assert _max_result_size_mb("b") == 1024                # fallback


def test_parquet_schema_cache_matches_inference_and_invalidates(
    spark, tmp_path
):
    """r14 optimization guard: ``parquet_schema`` must (a) return
    exactly what plain inference returns, (b) serve repeat calls from
    the cache (no re-inference), and (c) invalidate when the file at
    the same path is REWRITTEN with a different schema — the cache key
    carries (mtime_ns, size), so a rebuilt fixture can never read
    through a stale schema."""
    import os

    from lms_erp_data_integration_spark import catalog as cat_mod

    p = str(tmp_path / "t.parquet")
    spark.range(5).selectExpr("id AS a", "CAST(id AS STRING) AS b").write.mode(
        "overwrite"
    ).parquet(p)
    inferred = spark.read.parquet(p).schema
    got = cat_mod.parquet_schema(spark, p)
    assert got == inferred
    # repeat call is a cache hit (same object back)
    assert cat_mod.parquet_schema(spark, p) is got
    # rewrite with a DIFFERENT schema; bump mtime in case the fs
    # granularity would otherwise alias the key
    spark.range(5).selectExpr("id AS a", "id * 2 AS c").write.mode(
        "overwrite"
    ).parquet(p)
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns + 1_000_000, st.st_mtime_ns + 1_000_000))
    got2 = cat_mod.parquet_schema(spark, p)
    assert got2 == spark.read.parquet(p).schema
    assert "c" in got2.fieldNames() and "b" not in got2.fieldNames()
    # single entry per path (r15, r14 ADVICE #3): the rewrite EVICTED
    # the stale schema instead of accumulating beside it
    assert sum(1 for k in cat_mod._SCHEMA_CACHE if k == p) == 1


def test_schema_cache_invalidates_on_in_place_part_file_change(
    spark, tmp_path
):
    """r14 ADVICE #4: for a DIRECTORY table, an in-place change to
    bytes inside an existing part-file (same file names, directory
    mtime/size untouched) must still invalidate — the fingerprint
    folds child-entry stats in, not just the directory's own stat."""
    import os

    from lms_erp_data_integration_spark import catalog as cat_mod

    p = str(tmp_path / "t.parquet")
    spark.range(5).selectExpr("id AS a").write.mode("overwrite").parquet(p)
    got = cat_mod.parquet_schema(spark, p)
    assert got == spark.read.parquet(p).schema
    # touch one part-file's mtime WITHOUT renaming anything and pin
    # the directory's own stat back to its original values
    dstat = os.stat(p)
    part = next(
        os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
    )
    ps = os.stat(part)
    os.utime(part, ns=(ps.st_atime_ns, ps.st_mtime_ns + 5_000_000))
    os.utime(p, ns=(dstat.st_atime_ns, dstat.st_mtime_ns))
    fp_before = cat_mod._SCHEMA_CACHE[p][0]
    got2 = cat_mod.parquet_schema(spark, p)
    assert got2 == got  # same schema content either way
    assert cat_mod._SCHEMA_CACHE[p][0] != fp_before  # but re-validated


def test_base_table_cache_shares_frame_and_invalidates(spark, tmp_path):
    """r14 optimization guard for the base-DataFrame cache: (a) two
    Catalog instances over the same path get the SAME lazy frame (the
    relation is built once per session), (b) rewriting the file at the
    same path invalidates (stat-keyed, like the schema cache), and
    (c) the cached frame is plan metadata only — a rewrite with
    different DATA under an unchanged schema is picked up by the next
    action on a fresh key, i.e. results always come from the parquet
    bytes on disk."""
    import os
    import shutil

    from lms_erp_data_integration_spark import catalog as cat_mod

    d = tmp_path / "sfX"
    d.mkdir()
    p = str(d / "customer.parquet")
    spark.range(3).selectExpr(
        "id AS c_custkey", "CAST(id AS STRING) AS c_name"
    ).write.mode("overwrite").parquet(p)
    a = Catalog(spark, str(d)).table("customer")
    b = Catalog(spark, str(d)).table("customer")
    assert a is b  # same session + same (path, mtime, size) -> one frame
    assert a.count() == 3
    # rewrite with different data, same schema; bump mtime past fs
    # granularity so the stat key must change
    spark.range(7).selectExpr(
        "id AS c_custkey", "CAST(id AS STRING) AS c_name"
    ).write.mode("overwrite").parquet(str(tmp_path / "v2.parquet"))
    shutil.rmtree(p)
    shutil.move(str(tmp_path / "v2.parquet"), p)
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns + 1_000_000, st.st_mtime_ns + 1_000_000))
    c = Catalog(spark, str(d)).table("customer")
    assert c is not a
    assert c.count() == 7


def test_catalog_table_uses_cached_schema(spark, sf_dir):
    """The Catalog path reads through the schema cache: two Catalog
    instances over the same sf_dir produce identical schemas, and the
    cache holds an entry for each touched table path."""
    from lms_erp_data_integration_spark import catalog as cat_mod

    a = Catalog(spark, sf_dir).table("customer").schema
    b = Catalog(spark, sf_dir).table("customer").schema
    assert a == b
    assert any(
        k.endswith("customer.parquet") for k in cat_mod._SCHEMA_CACHE
    )
