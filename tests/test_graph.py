"""Iterative PageRank: the distributed join-aggregate loop must match
a dense single-machine reference, and lineage must stay bounded."""

import numpy as np
import pyspark.sql.functions as F

from aproximacion_1_etl_spark.operators.graph import pagerank
from aproximacion_1_etl_spark.sources.tables import load_table


def _dense_pagerank(edges, iterations=5, damping=0.85):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        received = np.zeros(n)
        for s, d in edges:
            received[idx[d]] += rank[idx[s]] / out_deg[idx[s]]
        rank = (1.0 - damping) / n + damping * received
    return {n_: rank[i] for n_, i in idx.items()}


def test_pagerank_matches_dense_reference(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges_df = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edge_list = [(r["src"], r["dst"]) for r in edges_df.collect()]
    expect = _dense_pagerank(edge_list)

    got = {
        r["node"]: r["rank"] for r in pagerank(edges_df, iterations=5).collect()
    }
    assert set(got) == set(expect)
    for node, r in expect.items():
        assert abs(got[node] - r) < 1e-9, (node, got[node], r)
    # totals agree too (dangling suppliers leak mass by design in this
    # formulation, so the total is < 1 but identical across engines)
    assert abs(sum(got.values()) - sum(expect.values())) < 1e-9
    assert 0.0 < sum(got.values()) <= 1.0


def test_pagerank_cyclic_graph_runs_full_iterations(spark):
    """A graph with cycles (senders that also receive) must take the
    full iteration count — the bipartite fixed-point shortcut only
    fires when rank flow has depth 1 — and still match the dense
    reference."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0)]
    edges_df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    expect = _dense_pagerank(edges, iterations=5)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges_df, iterations=5).collect()
    }
    assert set(got) == set(expect)
    for node, r in expect.items():
        assert abs(got[node] - r) < 1e-9, (node, got[node], r)
    # ranks genuinely moved across iterations (cycle redistributes):
    # iteration-2 ranks differ from iteration-5 ranks on this graph
    two = {
        r["node"]: r["rank"]
        for r in pagerank(edges_df, iterations=2).collect()
    }
    assert any(abs(two[n] - got[n]) > 1e-12 for n in got)


def test_pagerank_fixed_point_probe_is_exact_and_pays_on_converged_loops(spark):
    """detect_fixed_point: per-iteration bit-exact equality probe. On a
    graph whose rank vector settles (double arithmetic reaches a fixed
    point) the loop stops early with a result IDENTICAL to the full
    fixed-iteration run — equality on doubles, not a tolerance. The
    sf0.1 measurement lives in PERF.md (probe ~neutral at 5 iters,
    ~5x faster on a 30-iteration budget over a converged cycle)."""
    cyc = [(i, (i + 1) % 50) for i in range(50)]
    cyc_df = spark.createDataFrame(cyc, "src BIGINT, dst BIGINT")
    full = {
        r["node"]: r["rank"]
        for r in pagerank(cyc_df, iterations=25).collect()
    }
    probed = {
        r["node"]: r["rank"]
        for r in pagerank(
            cyc_df, iterations=25, detect_fixed_point=True
        ).collect()
    }
    assert probed == full  # bit-exact, not approximate
    # and the cyclic-reference case still matches the dense reference
    # when probed (cycle from the test above, unconverged at 5 iters)
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0)]
    edges_df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    expect = _dense_pagerank(edges, iterations=5)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges_df, iterations=5, detect_fixed_point=True
        ).collect()
    }
    for node, r in expect.items():
        assert abs(got[node] - r) < 1e-9, (node, got[node], r)
