"""Iterative graph algorithms as DataFrame loops (SURVEY.md §2.10).

The reference has no graph operators; the engine needs the iterative
join-aggregate pattern anyway (dedup_clusters' connected components is
one instance — text/dedup.py). PageRank is the canonical second one:
per iteration, every node sends rank/out_degree along its edges and
ranks re-aggregate — a join + groupBy per step, shuffling on the node
key both times.

Scale posture: the edge list is the big table (100 TB-class) and is
reused every iteration — cache it, and co-partition both shuffles on
the same key so AQE reuses the exchange. Lineage grows linearly with
iterations, so each iteration is cut with ``localCheckpoint`` —
without it, plan size (and task serialization time) grows without
bound and long loops eventually stack-overflow the optimizer. Driver
holds only conf, never data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list; returns
    (node, rank). Dangling nodes (no out-edges) keep receiving rank
    but distribute nothing; the per-iteration teleport term keeps the
    total finite without a driver-side normalization pass.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # the edge relation with out-degree attached is loop-invariant:
    # compute once, cache, reuse each iteration
    e_deg = e.join(out_deg, "src").cache()
    e_deg.count()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("received"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.coalesce("received", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)  # cut lineage each iteration
        )
    return ranks
