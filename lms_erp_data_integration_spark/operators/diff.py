"""Snapshot-diff operator family — the relational core of the engine.

The reference ships seven parameterized T-SQL diff queries executed
server-side (``src/jenzabar.py:50-80``); their common shape (SURVEY.md
section 2.4) is a *parameterized snapshot anti-join diff*: "rows of
truth-for-term not present in the mirror" plus, for enrollments, the
bidirectional add/drop variant (``DailyEnrollment.sql`` — README.md:4
"create and remove").

Scale posture: the mirror side of each diff is bounded (one term's worth
of rows) so we broadcast it — the anti-join then runs map-side with NO
shuffle of the large truth table. When both sides are huge callers can
pass ``broadcast_right=False`` and let AQE pick a sort-merge join with
skew splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_broadcast(df: DataFrame, do_broadcast: bool) -> DataFrame:
    return F.broadcast(df) if do_broadcast else df


def missing_rows(
    truth: DataFrame,
    mirror: DataFrame,
    keys: Sequence[str],
    broadcast_right: bool = True,
) -> DataFrame:
    """Rows of ``truth`` whose key is absent from ``mirror``
    (left-anti on equi-keys) — the ``Missing*.sql`` family
    (``src/jenzabar.py:52-55``)."""
    return truth.join(_maybe_broadcast(mirror, broadcast_right), list(keys), "left_anti")


def present_rows(
    truth: DataFrame,
    mirror: DataFrame,
    keys: Sequence[str],
    broadcast_right: bool = True,
) -> DataFrame:
    """Left-semi companion ("already present" checks)."""
    return truth.join(_maybe_broadcast(mirror, broadcast_right), list(keys), "left_semi")


def snapshot_diff(
    truth: DataFrame,
    mirror: DataFrame,
    keys: Sequence[str],
    status_col: str = "status",
    add_status: str = "active",
    drop_status: str = "deleted",
    broadcast_right: bool = True,
) -> DataFrame:
    """Bidirectional snapshot diff (``DailyEnrollment.sql`` semantics,
    SURVEY.md section 2.4 Q5):

    - adds:  in ``truth`` but not ``mirror``  -> status ``add_status``
    - drops: in ``mirror`` but not ``truth``  -> status ``drop_status``

    Output schema: key columns + ``status_col``. Callers that need
    payload columns join back to the source on the keys.
    """
    kl = list(keys)
    adds = (
        truth.select(*kl)
        .join(_maybe_broadcast(mirror.select(*kl), broadcast_right), kl, "left_anti")
        .withColumn(status_col, F.lit(add_status))
    )
    drops = (
        mirror.select(*kl)
        .join(_maybe_broadcast(truth.select(*kl), broadcast_right), kl, "left_anti")
        .withColumn(status_col, F.lit(drop_status))
    )
    return adds.unionByName(drops)
