"""Record the clean-solo benchmark reference (``bench_ref.json``).

Run this SOLO — no concurrent Spark sessions, idle host — after any
round that changes query plans. It executes the standard two-sweep
bench (bench.py) and snapshots the per-query mins as the reference
that future captures compare themselves against (``ref_flagged`` in
bench_full.json). Keeping the reference committed turns the driver's
one-shot capture from "a number someone must adjudicate later" into a
self-labeling measurement.

Usage: python scripts/record_bench_ref.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = bench.main()
    if rc != 0:
        return rc
    with open(os.path.join(here, "bench_full.json")) as f:
        full = json.load(f)
    with open(os.path.join(here, "bench_ref.json"), "w") as f:
        json.dump(
            {
                "sf": full["sf"],
                "recorded_as": "solo min across 2 separated sweeps",
                "total_sec": full["total_sec"],
                "queries": full["queries"],
            },
            f,
            indent=1,
        )
    print(f"bench_ref.json written ({len(full['queries'])} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
