"""Benchmark runner — times every registered query at the target scale
factor and prints ONE JSON line (driver contract).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is forced with a noop write (full computation, no driver
collect), timed after a warm-up of the session itself. Noise defense:
queries whose first run takes >= 0.5 s run twice and report the MIN
(single-capture timings on a shared host read up to 21x high in r5);
pairs disagreeing by >3x are listed in ``noise_flagged``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from lms_erp_data_integration_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    qs = entry_mod.queries()
    # JVM/session warm-up + parquet footer reads so the first timed
    # query doesn't absorb one-time session costs
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from lms_erp_data_integration_spark.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        cat.table(t).schema  # footer read only
    from lms_erp_data_integration_spark.caching import release_cached

    # One full query as warm-up, NOT counted in totals: the first query
    # of a session pays 3-7 s of whole-stage-codegen JIT that its twin
    # queries don't (r4: sync_missing_faculty_users 3.0 s vs its
    # identical-shape twin's 0.8 s). Recorded separately as warmup_sec
    # so round-over-round per-query comparison stops whipsawing on
    # which query ran first.
    warm_name = "sync_missing_faculty_users"
    t0 = time.perf_counter()
    try:
        force(qs[warm_name](spark, sf_dir))
    except Exception:  # noqa: BLE001
        pass
    warmup_sec = round(time.perf_counter() - t0, 3)
    release_cached()

    def timed_run(fn) -> float:
        t0 = time.perf_counter()
        try:
            force(fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 4)
        except Exception:  # noqa: BLE001
            dt = -1.0
        # unpersist the query's tracked intermediates (timed: cache
        # lifecycle is part of the query's real cost)
        release_cached()
        return dt

    timings: dict[str, float] = {}
    noise_flagged: list[str] = []
    retimed = 0
    # Deterministic alphabetical run order (registry order shifts as
    # the PRIORITY window rotates, which made per-query numbers
    # incomparable across rounds).
    for name in sorted(qs):
        t1 = timed_run(qs[name])
        # Noise defense (r5: the driver's one-shot capture read 8-21x
        # high on six unchanged queries — pure host tenancy): re-run
        # anything slow enough to matter and report the MIN; queries
        # under 0.5 s skip the second run (noise there can't move the
        # round verdict, and skipping keeps the added wall cost low).
        if t1 >= 0.5:
            retimed += 1
            t2 = timed_run(qs[name])
            if t2 >= 0:
                if max(t1, t2) > 3 * min(t1, t2):
                    noise_flagged.append(name)
                t1 = min(t1, t2)
        timings[name] = t1
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    timings = {n: round(t, 3) for n, t in timings.items()}

    # Full per-query detail goes to a file (the driver captures only the
    # last ~2000 chars of stdout — BENCH_r01–r03 all had "parsed": null
    # because the 123-query one-liner overflowed that window).
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_full.json"), "w") as f:
        json.dump(
            {
                "sf": sf_val,
                "total_sec": total,
                "warmup_sec": warmup_sec,
                "warmup_query": warm_name,
                "run_order": "sorted",
                "timing": "min_of_2_when_first_run_ge_0.5s",
                "n_retimed": retimed,
                "noise_flagged": noise_flagged,
                "queries": timings,
            },
            f,
            separators=(",", ":"),
        )

    # The ONE stdout JSON line must fit the driver's 2000-char tail
    # capture in full or it can't be parsed. Summary fields first, then
    # a headline "queries" dict: a pinned representative core plus the
    # slowest remaining queries, greedily packed under the budget.
    pinned = [
        "sync_daily_enrollment",
        "rel_q1_pricing_summary",
        "llm_dedup_minhash_lsh",
        "llm_dedup_clusters",
        "llm_sim_ivf_topk",
        "llm_quality_gate",
        "stream_events_hourly",
        "rel_pagerank_parts",
    ]
    headline = {n: timings[n] for n in pinned if n in timings}
    by_cost = sorted(
        (n for n in timings if n not in headline),
        key=lambda n: -timings[n],
    )

    def line_for(qs: dict) -> str:
        return json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "warmup_sec": warmup_sec,
                "timing": "min2",
                "n_noise_flagged": len(noise_flagged),
                "detail": "bench_full.json",
                "queries": qs,
            },
            separators=(",", ":"),
        )

    budget = 1900
    for n in by_cost:
        trial = dict(headline)
        trial[n] = timings[n]
        if len(line_for(trial)) > budget:
            break
        headline = trial
    print(line_for(headline))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
