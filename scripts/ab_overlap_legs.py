"""Interleaved same-session A/B for the r14 §2.6 leg-overlap changes
(stream_sim_ivf_search, sync_pipeline_run_report): the THREADED arm is
the registered query as committed; the SEQUENTIAL arm monkeypatches
``concurrent.futures.ThreadPoolExecutor`` with a serial executor that
runs each submitted callable inline — byte-identical work and
ordering, zero overlap. Rows are compared for equality every round.

Usage: python scripts/ab_overlap_legs.py [rounds] [query ...]
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from lms_erp_data_integration_spark.caching import release_cached  # noqa: E402
from lms_erp_data_integration_spark.session import get_spark  # noqa: E402

_REAL_POOL = cf.ThreadPoolExecutor


class _SerialFuture:
    def __init__(self, fn, *a, **kw):
        try:
            self._res, self._exc = fn(*a, **kw), None
        except BaseException as e:  # noqa: BLE001
            self._res, self._exc = None, e

    def result(self):
        if self._exc is not None:
            raise self._exc
        return self._res


class _SerialExecutor:
    """Drop-in ThreadPoolExecutor that runs everything inline at
    submit time — the exact sequential ordering of the pre-change
    code."""

    def __init__(self, *a, **kw):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def submit(self, fn, *a, **kw):
        return _SerialFuture(fn, *a, **kw)

    def map(self, fn, *iterables):
        return list(map(fn, *iterables))


def run(spark, qs, name, sf_dir, mode: str):
    cf.ThreadPoolExecutor = _REAL_POOL if mode == "threaded" else _SerialExecutor
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    rows = sorted(map(tuple, df.collect()))
    dt = time.perf_counter() - t0
    cf.ThreadPoolExecutor = _REAL_POOL
    release_cached()
    return dt, rows


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or ["stream_sim_ivf_search", "sync_pipeline_run_report"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_overlap_legs")
    qs = entry_mod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        run(spark, qs, name, sf_dir, "sequential")  # warm-up, uncounted
        run(spark, qs, name, sf_dir, "threaded")
        t_arm, s_arm = [], []
        for r in range(rounds):
            order = ["threaded", "sequential"] if r % 2 == 0 else [
                "sequential", "threaded"
            ]
            ref_rows = None
            for m in order:
                dt, rows = run(spark, qs, name, sf_dir, m)
                if ref_rows is None:
                    ref_rows = rows
                else:
                    assert rows == ref_rows, f"{name}: arms disagree!"
                (t_arm if m == "threaded" else s_arm).append(dt)
                print(f"{name} round {r} {m}: {dt:.2f}s", flush=True)
        print(
            f"{name}: threaded min={min(t_arm):.2f} "
            f"all={[round(t, 2) for t in t_arm]}"
        )
        print(
            f"{name}: sequential min={min(s_arm):.2f} "
            f"all={[round(t, 2) for t in s_arm]}"
        )
        print(
            f"{name}: min ratio threaded/sequential = "
            f"{min(t_arm) / min(s_arm):.3f}  (rows equal in all rounds)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
