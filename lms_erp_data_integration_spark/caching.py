"""Tracked persist/unpersist so multi-pass operators don't leak cache.

Several operators persist an intermediate both for reuse across passes
and as a CollapseProject barrier (see SNIPPETS.md / the dedup and
similarity modules). The returned DataFrames are lazy, so the operator
itself can never unpersist — by the time the caller evaluates, the
cache must still be live. Instead every persist goes through
:func:`tracked_persist`, and callers (bench loops, tests, long-lived
sessions) call :func:`release_cached` between queries to drop whatever
accumulated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` that registers the frame for later release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
