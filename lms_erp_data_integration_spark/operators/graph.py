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
    — multi-edges are collapsed to ``(src, dst, cnt)`` and persisted,
    out-degree (with multiplicity) is folded into that same persisted
    adjacency table, and every round's join derives from it. Rounds
    therefore scan distinct pairs, not raw edges (co-occurrence graphs
    are heavily multi-edged), and do ONE node-sized join each instead
    of a degree join plus a rank join. The degree and rank tables are
    node-sized and partially aggregated map-side.

    ``broadcast_ranks=True`` (default) broadcast-joins the rank vector
    each round — right while the node set fits executor memory
    (catalog-sized graphs), and the persisted adjacency then never
    reshuffles at all. At web-scale node counts a forced broadcast
    would OOM the driver, so pass ``False``: the adjacency is instead
    hash-partitioned on ``src`` before the persist, and the rank
    vector arrives partitioned on the node key from its own aggregate,
    so every round reuses that one partitioning. A run at depth >> 3
    would localCheckpoint the rank vector per round like
    ``dedup.duplicate_clusters`` to cut lineage growth.
    """
    # Collapse multi-edges ONCE before iterating: k parallel src->dst
    # edges each contribute (r div deg), i.e. exactly cnt * (r div deg)
    # — the recurrence is unchanged but every round now scans distinct
    # pairs instead of the raw edge list (co-occurrence graphs are
    # heavily multi-edged: the sf0.1 part graph is 2.4M raw edges but
    # far fewer distinct pairs). Out-degree (with multiplicity) is
    # folded into the same adjacency table, so each round does ONE
    # node-sized join, not two.
    pairs = tracked_persist(
        edges.select("src", "dst").groupBy("src", "dst").agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    deg = pairs.groupBy("src").agg(F.sum("cnt").alias("deg")).select(
        F.col("src").alias("dsrc"), "deg"
    )
    adj = pairs.join(
        F.broadcast(deg) if broadcast_ranks else deg,
        F.col("src") == F.col("dsrc"),
    ).select("src", "dst", "cnt", "deg")
    if not broadcast_ranks:
        adj = adj.repartition("src")
    adj = tracked_persist(adj)
    rank = deg.select(
        F.col("dsrc").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    keep = 100 - damping_pct

    def side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_ranks else df

    for _ in range(iterations):
        rank = (
            adj.join(side(rank), F.col("src") == F.col("node"))
            .select(
                F.col("dst").alias("node2"),
                (F.col("cnt") * F.expr("r div deg")).alias("c"),
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
