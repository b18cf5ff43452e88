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
    edges: DataFrame, iterations: int = 3, damping_pct: int = 85
) -> DataFrame:
    """Iterative PageRank in exact integer micro-units.

    ``edges`` is a directed edge list (``src``, ``dst``); every node is
    assumed to have at least one out-edge (true for symmetric
    co-occurrence graphs — otherwise add dangling-mass handling).
    Per iteration: each node sends ``rank div out_degree`` to each
    neighbor (integer division), and ranks update as
    ``(1 - d) + d * sum(contributions)`` in the same integer scale.

    Scale: the adjacency is persisted once and never reshuffled; each
    round broadcast-joins the node-sized rank vector against it and
    partially aggregates into node-count groups. The broadcast holds
    while the node set fits executor memory (catalog-sized graphs);
    a web-scale node set would switch the hint off and let both sides
    shuffle on the node key, reusing the same partitioning every
    round. A run at depth >> 3 would localCheckpoint the rank vector
    per round like ``dedup.duplicate_clusters`` to cut lineage growth.
    """
    # adjacency with the out-degree attached once via a BROADCAST join
    # (the degree table is node-sized), persisted so the three rounds
    # scan it without re-deriving the edge build. The rank vector is
    # node-sized too, so every round is a broadcast join over the
    # persisted adjacency plus one partial-aggregated shuffle of
    # node-count groups — the edge list itself never reshuffles.
    edges = edges.select("src", "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adj = tracked_persist(edges.join(F.broadcast(deg), "src"))
    rank = deg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    keep = 100 - damping_pct
    for _ in range(iterations):
        rank = (
            adj.join(F.broadcast(rank), adj["src"] == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                F.expr("r div deg").alias("c"),
            )
            .groupBy("node")
            .agg(
                (
                    F.lit(keep * 10_000)
                    + F.expr(f"({damping_pct} * sum(c)) div 100")
                ).alias("r")
            )
        )
    return rank
