"""Graph operators: iterative PageRank over a co-occurrence graph.

Complements the connected-components operator in ``dedup.py`` as the
second driver-loop iterative algorithm family (SURVEY.md iterative
coverage). All rank arithmetic is integer-scaled (micro-units with
integer division) so every iteration is bit-reproducible across
engines and partitionings — float PageRank sums would depend on
accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import tracked_persist


def pagerank_micros(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Iterative PageRank in exact integer micro-units.

    ``edges`` is a directed edge list (``src``, ``dst``); every node is
    assumed to have at least one out-edge (true for symmetric
    co-occurrence graphs — a graph with sinks needs dangling-mass
    handling added: collect the dangling rank per round and
    redistribute it uniformly, one extra node-sized aggregate).
    Per iteration: each node sends ``rank div out_degree`` to each
    neighbor (integer division), and ranks update as
    ``(1 - d) + d * sum(contributions)`` in the same integer scale.

    Scale: the (often expensive) input edge lineage is evaluated ONCE
    — the raw edge list is persisted first, and the out-degree table,
    initial ranks, and every round's join all derive from that persisted
    copy (degree-join-then-persist variants re-run the edge build two
    or three times; a window-count degree attach pays a full sort of
    the edge list). The degree table is node-sized and partially
    aggregated map-side. Each round joins the node-sized rank vector
    against the persisted edges and partially aggregates into
    node-count groups.

    ``broadcast_ranks=True`` (default) broadcast-joins the degree and
    rank vectors each round — right while the node set fits executor
    memory (catalog-sized graphs), and the persisted edge list then
    never reshuffles at all. At web-scale node counts a forced
    broadcast would OOM the driver, so pass ``False``: the edge list
    is instead hash-partitioned on ``src`` before the persist, and
    both node-sized tables arrive already partitioned on the node key
    from their own aggregates, so every round reuses that one
    partitioning. A run at depth >> 3 would localCheckpoint the rank
    vector per round like ``dedup.duplicate_clusters`` to cut lineage
    growth.
    """
    edges = edges.select("src", "dst")
    if not broadcast_ranks:
        edges = edges.repartition("src")
    edges = tracked_persist(edges)
    # distinct column names on the node-sized tables: both derive from
    # the same persisted edges, so shared names would trip the
    # ambiguous-self-join check
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("src").alias("dsrc"), "deg"
    )
    rank = deg.select(
        F.col("dsrc").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    keep = 100 - damping_pct

    def side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_ranks else df

    for _ in range(iterations):
        rank = (
            edges.join(side(deg), F.col("src") == F.col("dsrc"))
            .join(side(rank), F.col("src") == F.col("node"))
            .select(
                F.col("dst").alias("node2"),
                F.expr("r div deg").alias("c"),
            )
            .groupBy("node2")
            .agg(
                (
                    F.lit(keep * 10_000)
                    + F.expr(f"({damping_pct} * sum(c)) div 100")
                ).alias("r")
            )
            .select(F.col("node2").alias("node"), "r")
        )
    return rank
