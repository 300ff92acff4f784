"""Iterative graph algorithms as unrolled DataFrame plans.

Reference status: extension surface (the reference catalog,
01_source_me.R:1-346, has no graph stage). Complements
``operators/dedup.py::connected_components`` (min-label propagation +
pointer jumping): where CC iterates to convergence, PageRank runs a
FIXED number of damped power-iteration rounds, so the whole
computation stays one lazy Catalyst plan — and, because the round
count is static, the exact same computation is expressible as an
unrolled SQL CTE chain, which is what puts it under the DuckDB
differential (unusual for "iterative" algorithms).

Scale shape per round: one join of the rank vector against the edge
list (both keyed on node id — co-partitioned under bucketing) + one
keyed aggregate. No driver-side state beyond the loop counter; the
rank vector is never collected. For many rounds at 100 TB, checkpoint
the rank vector every ~5 rounds like connected_components does to cut
lineage growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Damped PageRank over a directed edge list, ``n_iter`` rounds.

    ``edges`` must contain every node as a ``src`` at least once
    (true by construction for symmetrized undirected graphs, where
    each undirected edge contributes both directions) — dangling
    nodes are out of scope here. Returns ``(node, rank)`` with
    r₀ = 1 and rₖ₊₁(v) = (1−d) + d·Σ_{u→v} rₖ(u)/deg(u),
    the classic uniform-start formulation. Float ops are ordered
    identically to the oracle CTE chain: divide per edge, sum, scale,
    add — so cross-engine drift is limited to summation-order ulps,
    absorbed by the caller's final ROUND.
    """
    from .. import cache

    deg = edges.groupBy(src).agg(F.count("*").alias("__deg"))
    # Edge list annotated with the source's out-degree. Every round's
    # plan references it, and Catalyst does not dedupe shared
    # subtrees — without a persist the (possibly expensive) edge
    # build would re-execute once per round inside the final action.
    ed = cache.track(edges.join(deg, src))
    ranks = deg.select(
        F.col(src).alias("node"), F.lit(1.0).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks, ed[src] == ranks["node"])
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = contrib.select(
            "node",
            (F.lit(1.0 - damping) + F.lit(damping) * F.col("__s")).alias(
                "rank"
            ),
        )
    return ranks
