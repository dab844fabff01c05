"""Semantic checks for the round-5 sweep-line / skyline / interpolation
operators — the hash-parity gate proves Spark==DuckDB; these prove the
answers mean what they claim (true peak overlap on a hand-built
schedule, dominance-freeness vs a brute-force skyline, exact linear
values on a constructed gap, FK-join estimates hitting exactly)."""

import datetime

import pyspark.sql.functions as F

from aproximacion_1_etl_spark.operators.intervals import max_concurrency
from aproximacion_1_etl_spark.operators.skyline import pareto_frontier_2d
from aproximacion_1_etl_spark.queries import ALL_QUERIES


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_max_concurrency_hand_schedule(spark):
    # k=a: [0,10) [5,15) [9,12) overlap 3 at t=9; [20,25) alone.
    # k=b: [0,10) and [10,20) touch but half-open => never overlap.
    rows = [
        ("a", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
        ("a", "2024-01-01 00:00:05", "2024-01-01 00:00:15"),
        ("a", "2024-01-01 00:00:09", "2024-01-01 00:00:12"),
        ("a", "2024-01-01 00:00:20", "2024-01-01 00:00:25"),
        ("b", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
        ("b", "2024-01-01 00:00:10", "2024-01-01 00:00:20"),
    ]
    df = spark.createDataFrame(
        [(k, _ts(s), _ts(e)) for k, s, e in rows], "k string, s timestamp, e timestamp"
    )
    out = {
        r["k"]: r
        for r in max_concurrency(df, "k", F.col("s"), F.col("e")).collect()
    }
    assert out["a"]["peak_concurrency"] == 3
    assert out["a"]["peak_at"] == "2024-01-01 00:00:09"
    assert out["a"]["n_intervals"] == 4
    assert out["b"]["peak_concurrency"] == 1
    assert out["b"]["peak_at"] == "2024-01-01 00:00:00"


def test_max_concurrency_spans_day_buckets(spark):
    # Three intervals crossing midnight: the cross-bucket offset must
    # carry the still-open count into the next day's bucket.
    rows = [
        ("a", "2024-01-01 23:00:00", "2024-01-02 01:00:00"),
        ("a", "2024-01-01 23:30:00", "2024-01-02 02:00:00"),
        ("a", "2024-01-02 00:30:00", "2024-01-02 00:45:00"),
    ]
    df = spark.createDataFrame(
        [(k, _ts(s), _ts(e)) for k, s, e in rows], "k string, s timestamp, e timestamp"
    )
    r = max_concurrency(df, "k", F.col("s"), F.col("e")).collect()[0]
    assert r["peak_concurrency"] == 3
    assert r["peak_at"] == "2024-01-02 00:30:00"


def test_max_concurrency_high_cardinality_key_no_forced_broadcast(spark):
    # 5k distinct user keys, two disjoint intervals each: the generic
    # operator must stay correct AND carry no forced broadcast hint in
    # its plan — the offsets/counts relations scale with |keys| (x
    # |day-buckets|), so a hardcoded F.broadcast would OOM the driver
    # on a high-cardinality key at 100x. Sizing is left to runtime
    # statistics / AQE, which still broadcasts the genuinely-small case.
    n_keys = 5000
    df = (
        spark.range(n_keys * 2)
        .select(
            F.format_string("u%05d", F.col("id") % n_keys).alias("k"),
            F.timestamp_seconds(
                F.lit(1704067200)
                + (F.col("id") % n_keys) * 60
                + (F.col("id") / n_keys).cast("long") * 10800
            ).alias("s"),
        )
        .withColumn("e", F.col("s") + F.expr("INTERVAL 1 HOUR"))
    )
    out = max_concurrency(df, "k", F.col("s"), F.col("e"))
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()
    got = out.collect()
    assert len(got) == n_keys
    # 1h intervals 3h apart never overlap -> peak is exactly 1 per key
    assert all(r["n_intervals"] == 2 for r in got)
    assert all(r["peak_concurrency"] == 1 for r in got)


def test_pareto_frontier_matches_bruteforce(spark):
    import itertools
    import random

    rng = random.Random(7)
    rows = [
        (g, round(rng.uniform(1, 100), 2), rng.randint(1, 50))
        for g in ("g1", "g2")
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, price double, size int")
    got = {
        (r["g"], r["price"], r["size"])
        for r in pareto_frontier_2d(
            df, "price", "size", by=["g"], n_buckets=8
        ).collect()
    }
    want = set()
    for g in ("g1", "g2"):
        pairs = {(p, s) for gg, p, s in rows if gg == g}
        for p, s in pairs:
            dominated = any(
                bp <= p and bs >= s and (bp < p or bs > s)
                for bp, bs in pairs
            )
            if not dominated:
                want.add((g, p, s))
    assert got == want
    # every kept pair really is undominated and counts are positive
    for g, p, s in got:
        assert (g, p, s) in want


def test_pareto_frontier_2d_ungrouped(spark):
    # by=None path: one global frontier over the whole relation
    df = spark.createDataFrame(
        [(1.0, 10), (1.0, 5), (2.0, 20), (3.0, 15), (2.5, 20), (4.0, 21)],
        "price double, size int",
    )
    got = {
        (r["price"], r["size"])
        for r in pareto_frontier_2d(df, "price", "size").collect()
    }
    assert got == {(1.0, 10), (2.0, 20), (4.0, 21)}


def _kd_bruteforce(rows, k):
    # rows: (group, c1..ck) where c1 minimized, rest maximized
    out = set()
    groups = {r[0] for r in rows}
    for g in groups:
        pts = {r[1:] for r in rows if r[0] == g}
        for p in pts:
            dominated = any(
                q != p
                and q[0] <= p[0]
                and all(q[i] >= p[i] for i in range(1, k))
                and (q[0] < p[0] or any(q[i] > p[i] for i in range(1, k)))
                for q in pts
            )
            if not dominated:
                out.add((g,) + p)
    return out


def test_pareto_kd_matches_bruteforce_both_paths(spark, monkeypatch):
    import random

    from aproximacion_1_etl_spark.operators import skyline as sk

    rng = random.Random(13)
    rows = [
        (g, round(rng.uniform(1, 50), 1), rng.randint(1, 30), rng.randint(1, 9))
        for g in ("g1", "g2")
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, price double, size int, w int")
    want = _kd_bruteforce(rows, 3)

    def run():
        return {
            (r["g"], r["price"], r["size"], r["w"])
            for r in sk.pareto_frontier_kd(
                df, minimize=["price"], maximize=["size", "w"], by=["g"]
            ).collect()
        }

    # small groups take the single-cell fast path
    assert run() == want
    # force the grid path (cell prune + two-phase kernel) on the same
    # data and require the identical frontier
    monkeypatch.setattr(sk, "_CELL_TARGET", 16)
    assert run() == want


def test_pareto_kd_degenerate_dimension_reduces_to_2d(spark, monkeypatch):
    import random

    from aproximacion_1_etl_spark.operators import skyline as sk

    rng = random.Random(99)
    rows = [
        ("g", round(rng.uniform(1, 50), 1), rng.randint(1, 30), 7)
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, price double, size int, w int")
    monkeypatch.setattr(sk, "_CELL_TARGET", 16)  # exercise the grid
    got3 = {
        (r["g"], r["price"], r["size"])
        for r in sk.pareto_frontier_kd(
            df, minimize=["price"], maximize=["size", "w"], by=["g"]
        ).collect()
    }
    got2 = {
        (r["g"], r["price"], r["size"])
        for r in pareto_frontier_2d(df, "price", "size", by=["g"]).collect()
    }
    # constant third dim: the 3-D frontier IS the 2-D frontier
    assert got3 == got2


def test_pareto_kd_merge_identity_sums_counts(spark):
    """frontier(A ∪ B) == frontier(frontier(A) ∪ frontier(B)), and a
    tuple present in several batches carries the SUM of its partial
    counts onto the merged frontier."""
    import random

    from aproximacion_1_etl_spark.operators.skyline import pareto_frontier_kd

    rng = random.Random(41)
    rows = [
        ("g", round(rng.uniform(1, 30), 1), rng.randint(1, 20), rng.randint(1, 5))
        for _ in range(240)
    ]
    # plant a strong tuple in EVERY batch (undominated: price below,
    # size/w above the generated ranges) — row-level round-robin split
    # puts 2 copies per batch, so the merged count must sum to 6
    rows += [("g", 0.5, 25, 9)] * 6
    schema = "g string, price double, size int, w int"
    df = spark.createDataFrame(rows, schema)
    args = dict(minimize=["price"], maximize=["size", "w"], by=["g"])

    full = {
        (r["price"], r["size"], r["w"]): r["n_rows"]
        for r in pareto_frontier_kd(df, **args).collect()
    }
    batches = [
        spark.createDataFrame(rows[i::3], schema) for i in range(3)
    ]
    u = pareto_frontier_kd(batches[0], **args)
    for b in batches[1:]:
        u = u.unionByName(pareto_frontier_kd(b, **args))
    merged = {
        (r["price"], r["size"], r["w"]): r["n_rows"]
        for r in pareto_frontier_kd(u, weight_col="n_rows", **args).collect()
    }
    assert merged == full
    assert merged[(0.5, 25, 9)] == 6


def test_pareto_kd_ungrouped(spark):
    from aproximacion_1_etl_spark.operators.skyline import pareto_frontier_kd

    df = spark.createDataFrame(
        [(1.0, 10, 1), (2.0, 20, 1), (2.0, 10, 9), (3.0, 20, 9), (1.5, 9, 1)],
        "price double, size int, w int",
    )
    got = {
        (r["price"], r["size"], r["w"])
        for r in pareto_frontier_kd(
            df, minimize=["price"], maximize=["size", "w"]
        ).collect()
    }
    assert got == {(1.0, 10, 1), (2.0, 20, 1), (2.0, 10, 9), (3.0, 20, 9)}


def test_pareto_frontier_degenerate_single_price(spark):
    df = spark.createDataFrame(
        [("x", 5.0, 1), ("x", 5.0, 9), ("x", 5.0, 9)],
        "g string, price double, size int",
    )
    out = pareto_frontier_2d(df, "price", "size", by=["g"]).collect()
    assert len(out) == 1
    assert out[0]["size"] == 9 and out[0]["n_rows"] == 2


def test_interpolation_is_linear_between_anchors(spark, sf_dir):
    out = ALL_QUERIES["interpolate_missing"](spark, sf_dir)
    rows = sorted(
        out.filter(F.col("event_type") == "click").collect(),
        key=lambda r: r["day"],
    )
    by_day = {r["day"]: r for r in rows}
    # interpolated days sit between their anchors' values (monotone
    # segment property of linear interpolation)
    known_days = [r["day"] for r in rows if not r["is_interpolated"]]
    for r in rows:
        if not r["is_interpolated"]:
            continue
        prevs = [d for d in known_days if d < r["day"]]
        nexts = [d for d in known_days if d > r["day"]]
        if not prevs or not nexts:
            continue
        lo_v = by_day[max(prevs)]["mean_value"]
        hi_v = by_day[min(nexts)]["mean_value"]
        lo, hi = min(lo_v, hi_v), max(lo_v, hi_v)
        assert lo - 1e-9 <= r["mean_value"] <= hi + 1e-9


def test_join_estimate_exact_on_fk_join(spark, sf_dir):
    rows = {
        r["join_name"]: r
        for r in ALL_QUERIES["join_cardinality_estimate"](
            spark, sf_dir
        ).collect()
    }
    # orders->lineitem is a contained FK join with unique left keys:
    # the uniform estimate is exact
    ol = rows["orders_lineitem"]
    assert ol["est_rows"] == ol["actual_rows"]
    assert ol["err_pct"] == 0.0
    # the many-many nation join: estimate formula holds, and the exact
    # count is produced without materializing the join
    cs = rows["customer_supplier_nation"]
    assert cs["est_rows"] == int(
        cs["n_left"] * cs["n_right"] / max(cs["ndv_left"], cs["ndv_right"])
    )
    assert cs["actual_rows"] > 0
    assert cs["err_pct"] is not None


def test_pareto_kd_int64_dominance_exact_past_2_53(spark):
    """Two bigint tuples that collapse to EQUAL doubles (2^53 vs
    2^53+1) must still dominate exactly on the integer dtype: the
    strictly-better tuple survives alone."""
    from aproximacion_1_etl_spark.operators.skyline import pareto_frontier_kd

    big = 2**53
    df = spark.createDataFrame(
        [(big, 10), (big + 1, 10)], "cost bigint, gain bigint"
    )
    # minimize cost, maximize gain: (big, 10) strictly dominates
    # (big+1, 10); under float64 both collapse to the same cost and
    # both would survive
    got = pareto_frontier_kd(df, minimize=["cost"], maximize=["gain"]).collect()
    assert len(got) == 1
    assert got[0]["cost"] == big and got[0]["gain"] == 10
