"""Query registry — single source of truth for the driver contract.

Every named plan registers (a) a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (b) an optional ANSI-SQL oracle string that DuckDB runs
over the same parquet tables. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.

Column names are aligned between both forms (the driver sorts columns
by name before value-hashing), and plans avoid raw double aggregates in
hashed output unless rounded — double addition is not associative, so
Spark's partial-aggregation order could otherwise diverge from DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named plan (decorator)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Names to surface first in ``all_queries()``. The driver's correctness
# gate checks only the FIRST 50 registry entries per round, so this list
# rotates per round to get every query a driver-verified row at its
# current code (r2 verdict: 73 of 123 had never been checked). Set by
# ``plans/__init__.py`` after all plan modules have registered.
PRIORITY: list[str] = []


def all_queries() -> dict[str, QueryFn]:
    """Registry view, priority names first (insertion order preserved)."""
    ordered = {n: QUERIES[n] for n in PRIORITY if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    return ordered
