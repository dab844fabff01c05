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
iterations, so iterations are cut with ``localCheckpoint`` — without
it, plan size (and task serialization time) grows without bound and
long loops eventually stack-overflow the optimizer. The node count
enters the plan as a broadcast 1-row aggregate, never as a driver-side
``.count()`` — the driver holds only conf, never data, and the whole
setup fuses into the first checkpoint job instead of running 2-3
separate driver-blocking jobs.
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
    detect_fixed_point: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list; returns
    (node, rank). Dangling nodes (no out-edges) keep receiving rank
    but distribute nothing; the per-iteration teleport term keeps the
    total finite without a driver-side normalization pass.

    ``detect_fixed_point=True`` adds a per-iteration bit-exact
    convergence probe: when ranks_i == ranks_{i-1} for every node
    (double equality — not a tolerance), every further iteration is
    the identity (the update is a deterministic function of the rank
    vector, and the decimal-cast sums make it partitioning-
    independent), so stopping early is provably result-identical to
    running all ``iterations``. The probe needs consecutive vectors
    materialized, so it checkpoints EVERY iteration (vs every 2nd) and
    runs one extra join job per iteration — a fixed per-iteration tax
    (~0.5 s at sf0.1, see PERF.md) that only pays off when the loop is
    long enough, or the graph converged enough, to skip iterations.
    Default off: the catalog's fixed-iteration oracle runs the exact
    advertised count; the structural depth-1 early stop below is free
    and stays always-on."""
    # the raw edge relation is scanned by nodes, e_deg AND non_receivers
    # — cache it or the upstream plan (often a join+distinct) runs 3×
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    # |V| as an in-plan broadcast scalar: a 1-row aggregate cross-joined
    # (broadcast) wherever 1/n or the teleport term is needed. No
    # .count() on the driver => no extra blocking job, and the constant
    # stays inside Catalyst's reach.
    nsc = nodes.agg(F.count("*").alias("n_nodes"))
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # the edge relation with out-degree attached is loop-invariant:
    # compute once, cache, reuse each iteration
    e_deg = e.join(out_deg, "src").cache()
    # Nodes with no inbound edge never receive contributions — their
    # rank is the constant teleport term every iteration. That set is
    # loop-invariant, so computing it once replaces the per-iteration
    # nodes-left-join (one whole shuffle join removed from the loop:
    # contribs' node set is exactly the distinct-dst set, so
    # contribs ∪ non_receivers covers every node exactly once).
    teleport = F.lit(1.0 - damping) / F.col("n_nodes")
    non_receivers = (
        nodes.join(
            e.select(F.col("dst").alias("node")).distinct(),
            "node",
            "left_anti",
        )
        .crossJoin(F.broadcast(nsc))
        .select("node", teleport.alias("rank"))
        .cache()
    )

    # Fixed-point early stop: if NO node both sends and receives (the
    # graph is pure-sources -> pure-sinks, e.g. any bipartite
    # interaction graph), rank flow has depth 1 — every sender's rank
    # is the constant teleport term from iteration 1 onward, so the
    # whole vector reaches its EXACT fixed point at iteration 2 and
    # further iterations are the identity. Detecting this costs one
    # small semi-join probe; on deep/cyclic graphs it's a no-op tax and
    # the full iteration count runs. Results are bit-identical to the
    # un-shortened loop (same operands in every surviving iteration).
    sender_receives = (
        e.select(F.col("dst").alias("node"))
        .join(e.select(F.col("src").alias("node")), "node", "left_semi")
        .limit(1)
        .count()
    )
    effective_iters = iterations if sender_receives else min(iterations, 2)

    ranks = nodes.crossJoin(F.broadcast(nsc)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    prev = None
    for i in range(effective_iters):
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            # decimal-cast sum: exact and order-independent, so ranks
            # are bit-identical across partitionings AND engines — this
            # is what lets a fixed-iteration run carry a value oracle
            # (DuckDB computes the same decimal sums; double summation
            # order would differ in the last ulp)
            .agg(
                F.sum(F.col("c").cast("decimal(38,20)"))
                .cast("double")
                .alias("received")
            )
        )
        ranks = (
            contribs.crossJoin(F.broadcast(nsc))
            .select(
                "node",
                (teleport + F.lit(damping) * F.col("received")).alias(
                    "rank"
                ),
            )
            .unionByName(non_receivers)
        )
        # Eager checkpoint every 2nd (and the last) iteration: lineage
        # stays bounded at depth 2 and each checkpoint is its own
        # measurable job, but the loop runs half as many jobs as a
        # per-iteration checkpoint — per-job fixed overhead, not data
        # volume, dominates an iteration at any SF. The convergence
        # probe needs every iteration materialized, so it switches to
        # per-iteration checkpoints (that cost is part of the probe
        # tax, measured in PERF.md).
        if detect_fixed_point:
            ranks = ranks.localCheckpoint(eager=True)
            if prev is not None:
                changed = (
                    ranks.alias("cur")
                    .join(prev.alias("pv"), "node")
                    .where(F.col("cur.rank") != F.col("pv.rank"))
                    .limit(1)
                    .count()
                )
                if changed == 0:
                    break  # bit-exact fixed point: all further
                    # iterations are the identity
            prev = ranks
        elif i % 2 == 1 or i == effective_iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    # loop-invariant caches are only needed during the iterations; the
    # returned ranks are checkpointed, so free executor storage now
    e.unpersist()
    nodes.unpersist()
    e_deg.unpersist()
    non_receivers.unpersist()
    return ranks
