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
