"""Dump ``explain('formatted')`` for named queries to files — the
optimization-round evidence trail (plans/r14/<query>_{before,after}.txt).

Usage: python scripts/explain_dump.py <outdir> <suffix> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt containing the FORMATTED plan of
the query at $SPARK_GRAFT_SF_DIR (default sf0.1). The plan is the
pre-execution AQE plan (isFinalPlan=false) — deterministic and
runnable without executing the query, which matters for streaming rows
whose execution has side effects; where a claim depends on the
runtime-final plan (AQE join selection), the A/B measurement in
OPTIMIZATION_r14.md is the evidence instead.

Streaming rows (memory-sink loops) cannot be explained without running
them; for those the dump records the returned batch frame's plan and
labels it as such.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from lms_erp_data_integration_spark.caching import release_cached  # noqa: E402
from lms_erp_data_integration_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        release_cached()
        print(f"wrote {name}_{suffix}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
