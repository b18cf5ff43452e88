"""Interleaved same-session A/B:
spark.sql.adaptive.coalescePartitions.parallelismFirst true (Spark
default; AQE coalesces shuffle partitions only down to the cluster
parallelism — 32 tiny tasks per stage here) vs false (AQE honors
advisoryPartitionSizeInBytes — tiny shuffles coalesce to 1-2 tasks).

The conf is runtime-settable, so both arms run in ONE session,
alternating order per round. Batch = the dedup/sim/relational rows
whose sf0.1 cost is stage-scheduling-dominated.

Usage: python scripts/ab_parallelism_first.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from lms_erp_data_integration_spark.caching import release_cached  # noqa: E402
from lms_erp_data_integration_spark.session import get_spark  # noqa: E402

KEY = "spark.sql.adaptive.coalescePartitions.parallelismFirst"

BATCH = [
    "llm_dedup_ngram_jaccard",
    "llm_dedup_containment",
    "llm_dedup_minhash_lsh",
    "llm_dedup_clusters",
    "llm_dedup_cluster_histogram",
    "llm_minhash_accuracy",
    "llm_dedup_simhash",
    "llm_sim_lsh_hyperplane",
    "llm_sim_ivf_topk",
    "llm_sim_ivf_multiprobe",
    "llm_sim_kmeans_assign",
    "rel_q7_volume_shipping",
    "rel_q8_market_share",
    "rel_q9_product_profit",
    "rel_q21_waiting_supplier",
    "rel_theta_setops",
    "rel_interval_overlap",
    "llm_quality_calibration",
    "llm_sketch_hll_rollup",
    "llm_winnow_pairs",
]


def sweep(spark, qs, sf_dir, val: str) -> float:
    spark.conf.set(KEY, val)
    t0 = time.perf_counter()
    for n in BATCH:
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_cached()
    return time.perf_counter() - t0


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_parallelism_first")
    qs = entry_mod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sweep(spark, qs, sf_dir, "true")   # warm both arms, uncounted
    sweep(spark, qs, sf_dir, "false")
    t_times, f_times = [], []
    for r in range(rounds):
        order = ["true", "false"] if r % 2 == 0 else ["false", "true"]
        for v in order:
            dt = sweep(spark, qs, sf_dir, v)
            (t_times if v == "true" else f_times).append(dt)
            print(f"round {r} parallelismFirst={v}: {dt:.2f}s", flush=True)
    print(f"true  (default) min={min(t_times):.2f} all={[round(t,2) for t in t_times]}")
    print(f"false (advisory) min={min(f_times):.2f} all={[round(t,2) for t in f_times]}")
    print(f"min ratio false/true = {min(f_times)/min(t_times):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
