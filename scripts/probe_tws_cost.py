"""Decompose the TWS rows' cost: full processor vs a stateless
processor (same transformWithStateInPandas machinery, ZERO state
protocol calls) vs the plain streaming floor. Interleaved in one
session; run solo.

Usage: python scripts/probe_tws_cost.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)

from lms_erp_data_integration_spark.session import get_spark  # noqa: E402
from lms_erp_data_integration_spark.streaming.windows import (  # noqa: E402
    events_stream,
    run_to_memory_sink,
)
from lms_erp_data_integration_spark.streaming import tws  # noqa: E402

_SEQ = iter(range(10**6))


class NoStateProcessor(StatefulProcessor):
    """Same shape as UserTotalsProcessor but touches NO state."""

    def init(self, handle) -> None:
        pass

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, tot = 0, 0
        for pdf in rows:
            n += len(pdf)
            tot += int(pdf["v_micros"].sum())
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value_micros": [tot]}
        )

    def close(self) -> None:
        pass


def run_tws(spark, sf_dir, processor) -> float:
    from lms_erp_data_integration_spark.plans.streaming_queries import (
        _rocksdb_provider,
    )

    ev = events_stream(spark, sf_dir)
    tws._ensure_worker_protobuf(ev)
    scaled = ev.select(
        "user_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_micros"),
    )
    out = scaled.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=tws.OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    t0 = time.perf_counter()
    with _rocksdb_provider(spark):
        run_to_memory_sink(out, f"probe_tws_{next(_SEQ)}", mode="update")
    return time.perf_counter() - t0


def run_plain(spark, sf_dir) -> float:
    ev = events_stream(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    run_to_memory_sink(agg, f"probe_plain_{next(_SEQ)}", mode="update")
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="probe_tws")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for r in range(3):
        t_plain = run_plain(spark, sf_dir)
        t_nostate = run_tws(spark, sf_dir, NoStateProcessor())
        t_full = run_tws(spark, sf_dir, tws.UserTotalsProcessor())
        print(
            f"round {r}: plain_agg={t_plain:.2f}s tws_nostate={t_nostate:.2f}s "
            f"tws_full={t_full:.2f}s (state-protocol delta "
            f"{t_full - t_nostate:+.2f}s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
