"""Physical-plan audit: for each registered query at the bench SF,
report scan pruning (ReadSchema width, PushedFilters), join strategies,
shuffle (Exchange) count, and whole-stage-codegen coverage. Run after
correctness is green; iterate until each plan is the one you'd want at
100 TB. Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from lms_erp_data_integration_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="explain_audit")
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        # execute THIS dataframe's own QueryExecution (collect, not a
        # write, which would build a separate plan): under AQE the final
        # plan with runtime-chosen joins only exists after the action
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        joins = re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b.*?\b"
            r"(Inner|LeftAnti|LeftSemi|LeftOuter|Cross)?",
            plan,
        )
        n_exchange = plan.count("Exchange ")
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        print(f"\n=== {name}")
        print(f"  exchanges={n_exchange} (AQE string includes pre+post plans)")
        for kind, side in joins:
            print(f"  join: {kind} {side}")
        for s in scans:
            cols = s.split(",") if s else []
            print(f"  scan cols={len(cols)}: {s[:90]}")
        for p in pushed:
            if p:
                print(f"  pushed: {p[:110]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
