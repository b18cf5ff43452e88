"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md M8): running per-user totals maintained across micro-batches
— the pattern for operators Spark's built-in aggregations can't express
(per-key custom state machines).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n_events long, total_value double"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) with explicit state — each
    micro-batch emits the refreshed totals for the users it touched.

    State lives in the state store (RocksDB/HDFS-backed on a cluster),
    partitioned by user_id: at 100 TB the state shards with the keys and
    no executor ever holds more than its partitions' users."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


MICROS_OUTPUT_SCHEMA = "user_id long, n_events long, total_value_micros long"
MICROS_STATE_SCHEMA = "n_events long, total_value_micros long"


def _update_micros(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, tot = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        tot += int(pdf["v_micros"].sum())
    state.update((n, tot))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_micros": [tot],
        }
    )


def running_user_totals_micros(events: DataFrame) -> DataFrame:
    """Exact-integer twin of :func:`running_user_totals`: the value is
    pre-scaled to integer micro-units in the PLAN (one deterministic
    round per row), so the state accumulates int64 — order-independent
    and therefore bit-exactly comparable to a SQL oracle, unlike a
    float sum whose result depends on accumulation order."""
    from pyspark.sql import functions as F

    scaled = events.select(
        "user_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_micros"),
    )
    return scaled.groupBy("user_id").applyInPandasWithState(
        _update_micros,
        MICROS_OUTPUT_SCHEMA,
        MICROS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
