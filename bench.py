"""Benchmark runner — times every registered query at the target scale
factor and prints ONE JSON line (driver contract).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is forced with a noop write (full computation, no driver
collect), timed after a warm-up of the session itself. Noise defense
(r6 verdict #3): TWO temporally-separated full sweeps over the query
list, per-query MIN across sweeps — back-to-back re-runs of one query
share the same tenancy window, so a sustained noisy interval defeated
the r6 min-of-2 (both passes read 6-30x high together); separating the
two measurements of each query by an entire sweep (~minutes) means a
noise window must outlast the whole run to go undetected. Pairs
disagreeing by >3x are listed in ``noise_flagged``. Additionally, when
a committed clean-solo reference exists (``bench_ref.json``), each
query's ratio vs its reference min is computed and queries reading >3x
the reference are listed in ``ref_flagged`` — a noisy capture labels
ITSELF instead of needing post-hoc solo adjudication.
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

    # Deterministic alphabetical run order (registry order shifts as
    # the PRIORITY window rotates, which made per-query numbers
    # incomparable across rounds). Two FULL sweeps: each query's two
    # measurements are separated by an entire sweep of every other
    # query, so a sustained tenancy-noise window (which defeated the
    # r6 back-to-back min-of-2) has to span the whole run to bias the
    # min. Queries under 0.1 s in sweep 1 skip sweep 2 (noise there
    # cannot move the verdict; skipping keeps added wall cost low).
    names = sorted(qs)
    sweep1 = {n: timed_run(qs[n]) for n in names}
    sweep2 = {
        n: timed_run(qs[n]) for n in names if sweep1[n] < 0 or sweep1[n] >= 0.1
    }
    timings: dict[str, float] = {}
    noise_flagged: list[str] = []
    for n in names:
        pair = [t for t in (sweep1[n], sweep2.get(n)) if t is not None and t >= 0]
        if not pair:
            timings[n] = -1.0
            continue
        if len(pair) == 2 and max(pair) > 3 * min(pair):
            noise_flagged.append(n)
        timings[n] = min(pair)
    retimed = len(sweep2)

    # Self-labeling vs the committed clean-solo reference (r6 verdict
    # #3): the reference is a solo, uncontended min-across-sweeps
    # capture (scripts/record_bench_ref.py). A query reading >3x its
    # reference in BOTH sweeps is almost certainly tenancy noise, not a
    # regression — record it so the capture adjudicates itself.
    ref_flagged: list[str] = []
    try:
        with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "bench_ref.json")) as f:
            ref = json.load(f).get("queries", {})
    except (OSError, ValueError):
        ref = {}
    for n in names:
        r = ref.get(n)
        if r and r > 0 and timings[n] > 3 * r and timings[n] >= 0.5:
            ref_flagged.append(n)
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
                "timing": "min_across_2_separated_sweeps",
                "n_retimed": retimed,
                "noise_flagged": noise_flagged,
                "ref_flagged": ref_flagged,
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
                "timing": "min2sweeps",
                "n_noise_flagged": len(noise_flagged),
                "n_ref_flagged": len(ref_flagged),
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
