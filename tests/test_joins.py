"""Temporal-join and wide-pivot operator tests on micro-fixtures."""

from datetime import datetime

import pyspark.sql.functions as F

from aproximacion_1_etl_spark.operators.joins import (
    asof_join,
    range_join_rollup,
)
from aproximacion_1_etl_spark.operators.refine import visit_columns


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    orders = spark.createDataFrame(
        [(1, 10, _ts("2024-01-05T00:00:00")),
         (2, 10, _ts("2024-01-01T00:00:00")),
         (3, 20, _ts("2024-01-05T00:00:00"))],
        ["okey", "cust", "odate"],
    )
    events = spark.createDataFrame(
        [(100, 10, _ts("2024-01-02T00:00:00"), "a"),
         (101, 10, _ts("2024-01-04T00:00:00"), "b"),
         (102, 10, _ts("2024-01-06T00:00:00"), "c")],
        ["event_id", "user", "ts", "etype"],
    )
    out = asof_join(
        orders, events, "cust", "user", "odate", "ts",
        value_cols=["etype"], tiebreak="event_id",
    )
    got = {r["okey"]: r["asof_etype"] for r in out.collect()}
    # order 1 (Jan 5): latest prior event is b (Jan 4); order 2 (Jan 1):
    # none; order 3: customer 20 has no events.
    assert got == {1: "b", 2: None, 3: None}


def test_asof_join_equal_ts_counts_and_tiebreaks(spark):
    orders = spark.createDataFrame(
        [(1, 10, _ts("2024-01-02T00:00:00"))], ["okey", "cust", "odate"]
    )
    events = spark.createDataFrame(
        [(100, 10, _ts("2024-01-02T00:00:00"), "x"),
         (101, 10, _ts("2024-01-02T00:00:00"), "y")],
        ["event_id", "user", "ts", "etype"],
    )
    out = asof_join(
        orders, events, "cust", "user", "odate", "ts",
        value_cols=["etype"], tiebreak="event_id",
    )
    # <= semantics: same-instant event matches; tie -> max event_id
    assert out.collect()[0]["asof_etype"] == "y"


def test_range_join_rollup_window_bounds(spark):
    orders = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:00:00"))], ["okey", "cust", "odate"]
    )
    events = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:00:00"), 1.0),   # in (inclusive start)
         (2, 10, _ts("2024-01-07T23:59:59"), 2.0),   # in (just under +7d)
         (3, 10, _ts("2024-01-08T00:00:00"), 4.0),   # out (exclusive end)
         (4, 99, _ts("2024-01-02T00:00:00"), 8.0)],  # out (other key)
        ["event_id", "user", "ts", "value"],
    )
    out = range_join_rollup(
        orders, events, "cust", "user", "odate", "ts", days=7,
        aggs={"n": F.count("_rts"),
              "s": F.coalesce(F.sum("value"), F.lit(0.0))},
    )
    row = out.collect()[0]
    assert (row["n"], row["s"]) == (2, 3.0)


def test_visit_columns_pivots_first_n(spark):
    events = spark.createDataFrame(
        [(10, _ts("2024-01-01T00:00:00"), 1, "a"),
         (10, _ts("2024-01-02T00:00:00"), 2, "b"),
         (10, _ts("2024-01-03T00:00:00"), 3, "c"),
         (10, _ts("2024-01-04T00:00:00"), 4, "d"),  # 4th: dropped
         (20, _ts("2024-02-01T00:00:00"), 5, "z")],
        ["user_id", "ts", "event_id", "event_type"],
    )
    out = visit_columns(
        events, ["user_id"], "ts", "event_id", ["event_type"], n_visits=3
    )
    rows = {r["user_id"]: r for r in out.collect()}
    assert rows[10]["visit_1_event_type"] == "a"
    assert rows[10]["visit_3_event_type"] == "c"
    assert rows[20]["visit_1_event_type"] == "z"
    assert rows[20]["visit_2_event_type"] is None


def test_bloom_prune_join_is_conservative_and_prunes(spark):
    """The Bloom pre-filter must never drop a true match (every present
    key tests positive in all probes), must prune most non-matching
    rows map-side, and the final join must be row-identical to the
    plain join — false positives die in the exact join."""
    import pyspark.sql.functions as F

    from aproximacion_1_etl_spark.operators.joins import (
        bloom_prune_join,
        build_bloom_bitmap,
    )

    big = spark.createDataFrame(
        [(i, f"p{i}") for i in range(2000)], ["k", "payload"]
    )
    small = spark.createDataFrame(
        [(i * 100, i) for i in range(20)], ["sk", "dim"]
    )
    out = bloom_prune_join(big, small, "k", "sk").select(
        "k", "payload", "dim"
    )
    plain = big.join(small, big["k"] == small["sk"]).select(
        "k", "payload", "dim"
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # conservative: every true key passes the filter; effective: the
    # map-side survivor count is far below |big| (20 matches + <1% fp)
    bitmap = build_bloom_bitmap(small, "sk")
    m = 64 * len(bitmap)
    probes = " AND ".join(
        f"((element_at(array({','.join(f'CAST({w} AS BIGINT)' for w in bitmap)}),"
        f" CAST((xxhash64(k, {h}) & {m - 1}) / 64 AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT),"
        f" CAST((xxhash64(k, {h}) & {m - 1}) % 64 AS INT))) != 0)"
        for h in range(3)
    )
    survivors = big.filter(F.expr(probes)).count()
    assert survivors >= 20
    assert survivors < 200, survivors

    import pytest

    with pytest.raises(ValueError):
        build_bloom_bitmap(small, "sk", m_bits=1000)


def test_asof_join_tolerance_subsecond_precision(spark):
    """A match 2.9s away must NOT pass a 2s tolerance: the comparison
    runs on fractional epoch seconds (merge_asof parity), not
    whole-second truncation (which would round 2.9 down to 2)."""
    from aproximacion_1_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10.000")], "k bigint, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:07.100", 42.0)],
        "k bigint, ts string, v double",
    ).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = asof_join(
        left, right, "k", "k", "ts", "ts", ["v"], tiebreak="v",
        tolerance_seconds=2,
    ).collect()
    assert len(out) == 1 and out[0]["asof_v"] is None
    # at 3s tolerance the same match passes
    ok = asof_join(
        left, right, "k", "k", "ts", "ts", ["v"], tiebreak="v",
        tolerance_seconds=3,
    ).collect()
    assert ok[0]["asof_v"] == 42.0
