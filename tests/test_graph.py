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


def test_adamic_adar_degree_cap_bounds_wedges_and_keeps_exact_weights(spark):
    """A synthetic hot pivot (degree 100) is dropped entirely by the
    frequent-prune cap while survivors keep exact uncapped weights —
    wedge volume stays bounded by sum over kept pivots of d(d-1)/2."""
    import math

    from aproximacion_1_etl_spark.operators.graph import adamic_adar_scores

    rows = []
    # hot pivot 999: neighbors 0..99 -> 4950 wedges if uncapped
    rows += [(999, n) for n in range(100)]
    # two small pivots sharing the pair (1, 2)
    rows += [(1, 1), (1, 2), (1, 3)]          # degree 3
    rows += [(2, 1), (2, 2)]                  # degree 2
    edges = spark.createDataFrame(rows, "piv bigint, nb bigint")

    capped = adamic_adar_scores(edges, "piv", "nb", max_degree=10)
    got = {(r["s1"], r["s2"]): r for r in capped.collect()}
    # bounded wedge volume: only the two small pivots emit wedges
    assert len(got) == 3  # C(3,2) from pivot 1; pivot 2's pair coincides
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    # the shared pair counts BOTH small pivots, with exact 1/ln(d)
    pair = got[(1, 2)]
    assert pair["common_nbrs"] == 2
    expected = 1.0 / math.log(3.0) + 1.0 / math.log(2.0)
    assert abs(pair["aa_score"] - expected) < 1e-12
    # uncapped, the hot pivot contributes C(100,2)=4950 wedges; the
    # small pivots' pairs all fall inside 0..99, so the distinct pair
    # count is exactly 4950 — the quadratic blowup the cap prevents
    uncapped = adamic_adar_scores(edges, "piv", "nb", max_degree=None)
    assert uncapped.count() == 4950


def test_connected_components_converges_and_labels_min(spark):
    """Chain + ring + isolated pair: every node gets the component's
    minimum id, matching a union-find reference, within the iteration
    bound (pointer jumping -> ~log2(diameter) rounds)."""
    from aproximacion_1_etl_spark.operators.graph import connected_components

    edges = []
    edges += [(i, i + 1) for i in range(10, 25)]       # chain, min 10, diam 15
    edges += [(100 + i, 100 + (i + 1) % 8) for i in range(8)]  # ring, min 100
    edges += [(500, 501)]                               # pair
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: r["comp"]
        for r in connected_components(df, max_iterations=10).collect()
    }
    for n in range(10, 26):
        assert got[n] == 10
    for n in range(100, 108):
        assert got[n] == 100
    assert got[500] == 500 and got[501] == 500
    assert len(got) == 16 + 8 + 2


def test_connected_components_raises_when_cap_too_small(spark):
    """Exhausting max_iterations without hitting the fixpoint raises
    instead of silently returning unconverged labels — a 40-node chain
    cannot converge in a single round even with pointer jumping."""
    import pytest

    from aproximacion_1_etl_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(df, max_iterations=1)


def test_kcore_peels_fringe_and_raises_on_small_cap(spark):
    """A 10-clique with a 12-node pendant chain: k=3 keeps exactly the
    clique (every member at degree 9) and peels the whole chain. A
    long chain at k=2 needs one sweep per endpoint pair, so a too-
    small max_rounds raises instead of returning a partial peel."""
    import pytest

    from aproximacion_1_etl_spark.operators.graph import kcore

    clique = [
        (i, j) for i in range(10) for j in range(10) if i < j
    ]
    chain = [(9 + i, 9 + i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(
        clique + chain, "src bigint, dst bigint"
    )
    got = {
        r["node"]: r["core_degree"]
        for r in kcore(df, k=3, max_rounds=20).collect()
    }
    assert got == {i: 9 for i in range(10)}

    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore(long_chain, k=2, max_rounds=3)


def _brute_triangles(edges):
    """Per-node triangle counts by brute force over a canonical edge
    set (python reference for the fold kernel)."""
    from itertools import combinations

    eset = set(edges)
    nodes = sorted({x for e in edges for x in e})
    counts = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in eset and (a, c) in eset and (b, c) in eset:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_forget_graph_stats_equals_rebuild_random_graphs(spark):
    """r11 RTBF edge: forget(store(full), deleted) == bulk rebuild
    over the remaining edges across random graphs and delete sets —
    the destroyed triangles are triangle_delta(remaining, deleted)
    (the fold's kernel with the deleted set in the Δ role), degrees
    decrement, and fully-disconnected nodes drop out of the store."""
    import random

    from aproximacion_1_etl_spark.operators.graph import (
        bulk_graph_stats,
        forget_graph_stats,
    )

    rng = random.Random(23)
    for trial in range(4):
        n_nodes = rng.choice([8, 12, 16])
        density = rng.choice([0.3, 0.45])
        edges = sorted(
            (a, b)
            for a in range(n_nodes)
            for b in range(a + 1, n_nodes)
            if rng.random() < density
        )
        if len(edges) < 5:
            continue
        # delete every edge touching a random node set (the
        # product-forget shape), plus one extra random edge
        doomed_nodes = set(rng.sample(range(n_nodes), 2))
        deleted = [
            e for e in edges if e[0] in doomed_nodes or e[1] in doomed_nodes
        ]
        spare = [e for e in edges if e not in deleted]
        if spare:
            deleted.append(spare[rng.randrange(len(spare))])
        remaining = [e for e in edges if e not in deleted]
        if not deleted or not remaining:
            continue
        efull = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
        edel = spark.createDataFrame(deleted, "u BIGINT, v BIGINT")
        erem = spark.createDataFrame(remaining, "u BIGINT, v BIGINT")
        store = bulk_graph_stats(efull).localCheckpoint(eager=True)
        got = {
            r.node: (r.degree, r.n_triangles)
            for r in forget_graph_stats(store, efull, edel).collect()
        }
        want = {
            r.node: (r.degree, r.n_triangles)
            for r in bulk_graph_stats(erem).collect()
        }
        assert got == want, (trial, edges, deleted)
        # RE-DELIVERY idempotence (ADVICE r11 #1): replaying the SAME
        # wave against the already-shrunk store must be a no-op — the
        # wave semi-joins against the current edge store, so edges
        # already deleted contribute nothing (no second decrement, no
        # silent drop of surviving nodes via the degree > 0 filter)
        shrunk = spark.createDataFrame(
            [(n, d, t) for n, (d, t) in got.items()],
            "node BIGINT, degree BIGINT, n_triangles BIGINT",
        )
        again = {
            r.node: (r.degree, r.n_triangles)
            for r in forget_graph_stats(shrunk, erem, edel).collect()
        }
        assert again == want, (trial, edges, deleted)


def test_triangle_delta_fold_equals_rebuild_random_graphs(spark):
    """fold(store(old), Δ) == rebuild(old ∪ Δ) across random graphs
    and split points — including Δ triangles with 2 and 3 new edges
    (the exactly-once dedup at the smallest new edge) and the
    bootstrap case old = ∅ (delta == bulk census)."""
    import random

    from aproximacion_1_etl_spark.operators.graph import (
        count_triangles,
        fold_graph_stats,
        triangle_delta,
    )

    rng = random.Random(11)
    for trial in range(4):
        n_nodes = rng.choice([8, 12, 16])
        density = rng.choice([0.25, 0.4])
        edges = sorted(
            (a, b)
            for a in range(n_nodes)
            for b in range(a + 1, n_nodes)
            if rng.random() < density
        )
        if len(edges) < 4:
            continue
        cut = rng.randrange(1, len(edges))
        old, new = edges[:cut], edges[cut:]
        eold = spark.createDataFrame(old, "u BIGINT, v BIGINT")
        enew = spark.createDataFrame(new, "u BIGINT, v BIGINT")

        full_tri = _brute_triangles(edges)
        old_tri = _brute_triangles(old)
        delta = {
            r.node: r.delta_triangles
            for r in triangle_delta(eold, enew).collect()
        }
        merged = {
            n: old_tri.get(n, 0) + delta.get(n, 0)
            for n in set(old_tri) | set(delta)
        }
        assert {n: v for n, v in merged.items() if v} == full_tri, (
            trial, old, new,
        )

        # fold_graph_stats end-to-end vs degree+triangle rebuild
        deg_old = {}
        for u, v in old:
            deg_old[u] = deg_old.get(u, 0) + 1
            deg_old[v] = deg_old.get(v, 0) + 1
        store = spark.createDataFrame(
            [
                (n, deg_old.get(n, 0), old_tri.get(n, 0))
                for n in set(deg_old) | set(old_tri)
            ],
            "node BIGINT, degree BIGINT, n_triangles BIGINT",
        )
        folded = {
            r.node: (r.degree, r.n_triangles)
            for r in fold_graph_stats(store, eold, enew).collect()
        }
        deg_full = {}
        for u, v in edges:
            deg_full[u] = deg_full.get(u, 0) + 1
            deg_full[v] = deg_full.get(v, 0) + 1
        want = {
            n: (deg_full.get(n, 0), full_tri.get(n, 0))
            for n in set(deg_full) | set(full_tri)
        }
        assert folded == want, (trial, old, new)

    # bootstrap: delta from empty == the bulk count_triangles census
    tri_edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (0, 3)]
    e = spark.createDataFrame(tri_edges, "u BIGINT, v BIGINT")
    empty = spark.createDataFrame([], "u BIGINT, v BIGINT")
    boot = {
        r.node: r.delta_triangles
        for r in triangle_delta(empty, e).collect()
    }
    bulk = {
        r.node: r.n_triangles
        for r in count_triangles(e, "u", "v").collect()
    }
    assert boot == bulk == _brute_triangles(tri_edges)


def test_incremental_graph_stats_key_schema(spark, sf_dir):
    """The catalog key emits the top-20 maintained rows with dense
    ranks and non-negative counts (value equality vs the rebuild is
    the oracle's job)."""
    from aproximacion_1_etl_spark.queries import ALL_QUERIES

    rows = ALL_QUERIES["incremental_graph_stats"](spark, sf_dir).collect()
    assert len(rows) <= 20
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    tri = [r.n_triangles for r in rows]
    assert tri == sorted(tri, reverse=True)
    assert all(r.degree >= 2 for r in rows if r.n_triangles > 0)


def test_personalized_pagerank_matches_dense_reference_and_stays_sparse(spark):
    """PPR vs a dense numpy reference on a small cyclic graph (both
    orientations), and the frontier property: nodes unreachable from
    the seeds never enter the returned vector."""
    from aproximacion_1_etl_spark.operators.graph import (
        personalized_pagerank,
    )

    und = [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)]
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    # a disconnected component the seeds can never reach
    edges += [(100, 101), (101, 100)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    seeds, d, iters = [0, 2], 0.85, 4

    got = {
        r.node: r.rank
        for r in personalized_pagerank(
            df, seeds=seeds, iterations=iters
        ).collect()
    }
    assert all(n < 100 for n in got), "unreachable component leaked in"

    out_deg = {}
    for a, _ in edges:
        out_deg[a] = out_deg.get(a, 0) + 1
    rank = {s: 1.0 / len(seeds) for s in seeds}
    for _ in range(iters):
        received = {}
        for a, b in edges:
            if a in rank:
                received[b] = received.get(b, 0.0) + rank[a] / out_deg[a]
        nxt = {}
        for s in seeds:
            nxt[s] = (1.0 - d) / len(seeds)
        for n, v in received.items():
            nxt[n] = nxt.get(n, 0.0) + d * v
        rank = nxt
    assert set(got) == set(rank)
    for n, v in rank.items():
        assert abs(got[n] - v) < 1e-12, n
    # probability mass stays bounded (dangling/teleport leakage only
    # ever removes mass, never adds)
    assert sum(got.values()) <= 1.0 + 1e-12

    with __import__("pytest").raises(ValueError):
        personalized_pagerank(df, seeds=[], iterations=2)


def test_triangle_delta_oversized_batch_degrades_to_shuffle_join(
    spark, monkeypatch
):
    """VERDICT r9 #3: the Δ-side membership joins are broadcast only
    under the daily-batch-size contract. Above the bound the hint is
    dropped (shuffle join), and the fold result is unchanged — the
    guard degrades, never OOMs or errors."""
    from aproximacion_1_etl_spark.operators import graph as g

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (0, 3), (3, 4)]
    eold = spark.createDataFrame(edges[:3], "u BIGINT, v BIGINT")
    enew = spark.createDataFrame(edges[3:], "u BIGINT, v BIGINT")

    want = {
        r.node: r.delta_triangles
        for r in g.triangle_delta(eold, enew).collect()
    }
    monkeypatch.setattr(g, "TRIANGLE_DELTA_BROADCAST_MAX", 0)
    got_df = g.triangle_delta(eold, enew)
    got = {r.node: r.delta_triangles for r in got_df.collect()}
    assert got == want
    # the forced hint is really gone from the un-executed logical plan
    logical = got_df._jdf.queryExecution().logical().toString()
    assert "broadcast" not in logical.lower()


def test_personalized_pagerank_eps_zero_drops_forced_broadcast(
    spark, monkeypatch
):
    """ADVICE r9 #2: the frontier broadcast is forced only when
    eps > 0 bounds it (seed-mass/eps); at eps=0 (exact small-graph
    mode) no broadcast hint may be placed — a connected 100-TB
    graph's frontier reaches ~|V| and a forced broadcast would OOM.
    The per-round checkpoint erases lineage, so the hint is observed
    by spying on F.broadcast inside the module."""
    from aproximacion_1_etl_spark.operators import graph as g

    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")

    calls = []
    real_broadcast = g.F.broadcast

    def spy(d):
        calls.append(1)
        return real_broadcast(d)

    monkeypatch.setattr(g.F, "broadcast", spy)
    exact = g.personalized_pagerank(df, seeds=[0], iterations=2, eps=0.0)
    n_exact = len(calls)
    trunc = g.personalized_pagerank(
        df, seeds=[0], iterations=2, eps=1e-9
    )
    n_trunc = len(calls) - n_exact
    assert n_exact == 0, "eps=0 must not force the frontier broadcast"
    assert n_trunc == 2, "eps>0 forces one broadcast per round"
    # and with a tiny eps the truncated run equals the exact one
    a = {r.node: r.rank for r in exact.collect()}
    b = {r.node: r.rank for r in trunc.collect()}
    assert a == b
