"""Interleaved same-session A/B for the base-DataFrame cache
(catalog._base_table): sweep a fixed batch of registered queries with
the cache BYPASSED (fresh relation construction per table call — the
pre-change behavior) vs ENABLED, alternating A/B/A/B within one
session so tenancy noise hits both arms. Results are not compared for
equality here (the cache cannot change values: same logical plan —
the full oracle parity gate covers correctness); this measures wall
time only.

Usage: python scripts/ab_table_cache.py [rounds] (default 3)
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from lms_erp_data_integration_spark import catalog as cat_mod  # noqa: E402
from lms_erp_data_integration_spark.caching import release_cached  # noqa: E402
from lms_erp_data_integration_spark.session import get_spark  # noqa: E402

# A representative tail batch: cheap/medium rows across families where
# the per-query fixed cost is the dominant term (the cache's target).
BATCH = [
    "sync_missing_faculty_users",
    "sync_missing_courses",
    "sync_daily_enrollment",
    "rel_q1_pricing_summary",
    "rel_q12_priority_class",
    "rel_semi_anti_counts",
    "rel_top_orders_per_customer",
    "rel_value_histogram",
    "rel_events_props_json",
    "rel_event_transitions",
    "llm_text_token_counts",
    "llm_text_quality",
    "llm_text_language_id",
    "llm_dedup_exact",
    "llm_corpus_stats",
    "llm_sample_stratified",
    "rel_fuzzy_part_match",
    "rel_customer_order_setops",
    "rel_interval_overlap",
    "rel_funnel_conversion",
]

_REAL = cat_mod._base_table


def _bypass(spark, path, name):
    """Pre-change behavior: build the relation fresh on every call
    (schema still cached — that change is already committed and is
    not under test here)."""
    cache = getattr(spark, "_lms_table_cache", None)
    if cache is not None:
        cache.clear()
    df = spark.read.schema(cat_mod.parquet_schema(spark, path)).parquet(path)
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts") if name == "events" else None
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def sweep(spark, qs, sf_dir, mode: str) -> float:
    cat_mod._base_table = _bypass if mode == "A" else _REAL
    t0 = time.perf_counter()
    for n in BATCH:
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_cached()
    dt = time.perf_counter() - t0
    cat_mod._base_table = _REAL
    return dt


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_table_cache")
    qs = entry_mod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # warm both arms once (codegen/first-encounter) — uncounted
    sweep(spark, qs, sf_dir, "A")
    sweep(spark, qs, sf_dir, "B")
    a_times, b_times = [], []
    for r in range(rounds):
        # alternate order each round so order effects cancel
        order = ["A", "B"] if r % 2 == 0 else ["B", "A"]
        for m in order:
            dt = sweep(spark, qs, sf_dir, m)
            (a_times if m == "A" else b_times).append(dt)
            print(f"round {r} arm {m}: {dt:.2f}s", flush=True)
    print(
        f"A (bypass)  min={min(a_times):.2f} all={[round(t,2) for t in a_times]}"
    )
    print(
        f"B (cached)  min={min(b_times):.2f} all={[round(t,2) for t in b_times]}"
    )
    print(f"min ratio B/A = {min(b_times)/min(a_times):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
