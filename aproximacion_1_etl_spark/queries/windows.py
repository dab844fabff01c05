"""Query catalog — windows domain (mechanically moved from queries.py)."""


from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from aproximacion_1_etl_spark.operators.joins import (
    asof_join,
    range_join_rollup,
)
from aproximacion_1_etl_spark.sources.tables import load_table
from .common import *  # noqa: F401,F403



def q_asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event annotated with the user's most recent
    order at or before the event time (union + single-key-shuffle
    window — no range-join explosion; SURVEY.md §2.5
    [absent]-but-useful)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = load_table(spark, sf_dir, "orders")
    out = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey"],
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        _ts_str("ts").alias("event_ts"),
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        _ts_str("asof_ts").alias("asof_ts"),
    )


def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: per event, the same user's event count / value
    mass in the next 24 h (burst detection; equi-key + range
    predicate)."""
    events = load_table(spark, sf_dir, "events")
    left = events.select("event_id", "user_id", "ts")
    right = events.select("user_id", "ts", "value")
    out = range_join_rollup(
        left,
        right,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        days=1,
        aggs={
            "n_events_24h": F.count("_rts"),
            "sum_value_24h": _fround(
                F.coalesce(
                    F.sum(F.col("value").cast("decimal(30,8)")),
                    F.lit(0).cast("decimal(30,8)"),
                ).cast("double"),
                2,
            ),
        },
    )
    return out.select(
        "event_id",
        "user_id",
        _ts_str("ts").alias("event_ts"),
        "n_events_24h",
        "sum_value_24h",
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame: per-customer running spend in order-date order."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        _fround(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


def q_trailing_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per event, the same user's average value over
    the trailing 7 days (range on epoch seconds — value-based frame, not
    row-count-based)."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("double").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-7 * 86400, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        _ts_str("ts").alias("event_ts"),
        _fround(
            F.sum(F.col("value").cast("decimal(30,8)")).over(w).cast("double")
            / F.count("value").over(w),
            4,
        ).alias("avg_7d"),
    )


def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile ranking: order-value quartiles within each market segment
    (customer join), rolled up to quartile boundaries."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o["o_custkey"] == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    q = j.withColumn("quartile", F.ntile(4).over(w))
    return q.groupBy("c_mktsegment", "quartile").agg(
        F.count("*").alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (2 h) via lag + conditional cumsum."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("double")
    prev = F.lag(sec).over(w)
    new_session = F.when(
        prev.isNull() | ((sec - prev) > 7200), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


def q_session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in gap-session windows (F.session_window, 2 h gap) — the
    declarative form of the lag/cumsum sessionize query: one aggregation,
    sessions merged by the engine. Works identically over readStream
    (with a watermark) — batch form here so the oracle can check exact
    session boundaries."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "2 hours").alias("sw")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            _ts_str(F.col("sw.start")).alias("session_start"),
            "n_events",
        )
    )


# ------------------------------------------------- round-2 window extras


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offsets: per user, value change vs previous event and
    seconds until the next event."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("double").cast("long")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "user_id",
        _fround(F.col("value") - F.lag("value").over(w), 4).alias(
            "value_delta"
        ),
        (F.lead(sec).over(w) - sec).alias("gap_sec"),
    )


def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of order value within each market
    segment (customer broadcast join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            "o_orderkey",
            "c_mktsegment",
            _fround(F.percent_rank().over(w), 6).alias("pct_rank"),
            _fround(F.cume_dist().over(w), 6).alias("cum_dist"),
        )
    )


def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value(... IGNORE NULLS): per event, carry forward the most
    recent 'big' value (> 500) the same user produced — the
    gaps-and-islands fill pattern."""
    ev = load_table(spark, sf_dir, "events")
    big = F.when(F.col("value") > 500, F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        _fround(F.last(big, ignorenulls=True).over(w), 4).alias(
            "last_big_value"
        ),
    )


def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample (§2.6 extension): per-user daily event counts
    over the full calendar span, zero-filled for missing days, with the
    last-seen event_type carried forward (last IGNORE NULLS).

    Scale shape: the day spine is tiny (span in days) and the per-user
    daily aggregate reduces before the spine join, so the only full
    shuffle is the groupBy on (user_id, day); the spine is broadcast.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    day = F.to_date("ts").alias("day")
    # count + day's last event_type fused into ONE aggregation (max_by
    # with a (ts, event_id) struct order) — one shuffle and one scan
    # where a row_number-window formulation would pay a second of each.
    daily = ev.groupBy("user_id", day).agg(
        F.count("*").alias("n_events"),
        F.max_by(
            "event_type", F.struct(F.col("ts"), F.col("event_id"))
        ).alias("last_type"),
    )
    span = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = span.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    users = daily.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(days))
    filled = spine.join(daily, ["user_id", "day"], "left")
    w_ff = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("last_type", ignorenulls=True).over(w_ff).alias("carried_type"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (§2.6 extension): customers grouped by
    first-order month, distinct actives per (cohort, months-since) for
    the first 6 months. One agg to find cohorts + one shuffle join back
    on the same key (co-partitioned at scale; broadcast when the cohort
    dim fits)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.trunc("o_orderdate", "month").alias("om")
    )
    first = o.groupBy("o_custkey").agg(F.min("om").alias("cohort"))
    m = F.months_between(F.col("om"), F.col("cohort")).cast("int")
    return (
        o.join(first, "o_custkey")
        .select(
            "o_custkey",
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            m.alias("months_since"),
        )
        .where(F.col("months_since") <= 6)
        .groupBy("cohort_month", "months_since")
        .agg(F.count_distinct("o_custkey").alias("n_customers"))
    )


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (§2.6 extension): users who viewed, then
    clicked AFTER their first view, then purchased AFTER that first
    click. Implemented as three STACKED whole-partition windows on the
    same user_id partitioning — each stage frontier references the
    previous one, but because every window (and the per-user reduce)
    shares the partition key, Catalyst plans ONE exchange for the whole
    chain (plan-audited: 2 exchanges total vs 8 for the equivalent
    aggregate-join-aggregate cascade; the event stream is scanned
    once, not three times)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "v_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("c_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("v_ts").alias("v_ts"),
        F.max("c_ts").alias("c_ts"),
        F.max("p_ts").alias("p_ts"),
    )
    counts = per_user.agg(
        F.count("v_ts").alias("n_v"),
        F.count("c_ts").alias("n_c"),
        F.count("p_ts").alias("n_p"),
    )
    return counts.selectExpr(
        "stack(3, '1_view', n_v, '2_click', n_c, '3_purchase', n_p)"
        " AS (stage, n_users)"
    )


def q_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 recency-weighted feature engineering: per-user engagement
    = sum(value x 2^-(age_weeks)) with a 1-week half-life — the
    standard decay feature for freshness-aware sampling/ranking. Age
    quantizes to whole weeks so the decay factor is an exact power of
    two (bit-identical in any engine — pow/exp of arbitrary doubles
    carries no cross-engine rounding guarantee, 0.5^k of an integer k
    does); the weighted sum is decimal-cast. Reference anchor = the
    corpus max timestamp, computed in-plan as a broadcast scalar."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("t0"))
    aged = ev.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "value",
        F.expr("datediff(t0, ts) div 7").cast("int").alias("wk"),
    )
    term = F.col("value") * F.pow(F.lit(0.5), F.col("wk"))
    return (
        aged.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(term.cast("decimal(38,18)")).alias("s"),
        )
        .select(
            "user_id",
            "n_events",
            _fround(F.col("s").cast("double"), 6).alias("decayed_value"),
        )
    )


def q_sequence_pattern_match(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 sequential pattern detection (the MATCH_RECOGNIZE gap,
    Spark-first): per-user event streams are folded into ordered
    initial-letter strings (bounded by per-user activity — the state
    is one char per event, never the rows themselves), and behavioral
    patterns run as ordinary regexes over them: browse-to-buy
    (view then purchase with only views/clicks between), error-then-
    recovery, and signup-to-first-purchase. Per pattern: users
    matched + total non-overlapping occurrences. Greedy leftmost
    matching behaves identically in Java regex and RE2 for these
    alternation-free patterns, so the key value-checks cross-engine.
    One shuffle builds the sequences; each pattern is a map-side
    regexp count over |users| rows."""
    ev = load_table(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring("event_type", 1, 1).alias("i"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")),
                    lambda x: x.getField("i"),
                ),
                "",
            ).alias("seq")
        )
    )
    patterns = [
        ("browse_to_buy", "v[vc]*p"),
        ("error_recovery", "e[ev]*p"),
        ("signup_to_purchase", "s[cev]*p"),
    ]
    out = None
    for name, pat in patterns:
        hits = seqs.select(
            F.size(
                F.regexp_extract_all(F.col("seq"), F.lit(pat), F.lit(0))
            ).alias("k")
        )
        agg = hits.agg(
            F.sum((F.col("k") > 0).cast("int"))
            .cast("bigint")
            .alias("n_users"),
            F.sum("k").cast("bigint").alias("n_matches"),
        ).select(
            F.lit(name).alias("pattern"), "n_users", "n_matches"
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 extension — peak-concurrency sweep line: how many events
    were "open" at once per type, treating each event as an interval
    [ts, ts + 60 + event_id % 240 seconds). Two-phase prefix sum
    (operators/intervals.py): per-instant delta aggregation, day-bucket
    intra-window, cross-bucket offsets on the tiny bucket summary — no
    single-task global running sum at any width.
    """
    from aproximacion_1_etl_spark.operators.intervals import max_concurrency

    ev = load_table(spark, sf_dir, "events")
    end = F.expr(
        "ts + make_dt_interval(0, 0, 0, CAST(60 + event_id % 240 AS DOUBLE))"
    )
    return max_concurrency(ev, "event_type", F.col("ts"), end).orderBy(
        "event_type"
    )


def q_interpolate_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 extension — linear interpolation of gaps in a per-type
    daily mean-value series (gap_fill_daily carries the LAST value
    forward; feature pipelines usually want the line between the
    surrounding anchors instead). Spine = full calendar span; window
    state per type is bounded by the span in DAYS (the daily aggregate
    runs first), so the per-type window never sees raw events —
    parallelism |types|, partition size |days|.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    known = ev.groupBy("event_type", day).agg(
        F.count("*").alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(38,18)")).cast("double")
            / F.count("*")
        ).alias("mv"),
    )
    span = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = span.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    types = known.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(days))
    g = spine.join(known, ["event_type", "day"], "left")

    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    has = F.col("n_events").isNotNull()
    g = (
        g.withColumn(
            "pd", F.last(F.when(has, F.col("day")), True).over(w_prev)
        )
        .withColumn("pv", F.last(F.when(has, F.col("mv")), True).over(w_prev))
        .withColumn(
            "nd", F.first(F.when(has, F.col("day")), True).over(w_next)
        )
        .withColumn(
            "nv", F.first(F.when(has, F.col("mv")), True).over(w_next)
        )
    )
    ratio = F.datediff("day", "pd").cast("double") / F.datediff(
        "nd", "pd"
    ).cast("double")
    interp = (
        F.when(has, F.col("mv"))
        .when(F.col("pd").isNull(), F.col("nv"))
        .when(F.col("nd").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * ratio)
    )
    return g.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        _fround(interp, 4).alias("mean_value"),
        F.col("n_events").isNull().alias("is_interpolated"),
    )


def q_multi_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store rolling features at MULTIPLE HORIZONS in one plan:
    per (user, day) trailing 1/7/28-day event counts and value sums,
    all horizons served by RANGE frames over ONE partitioning of the
    daily aggregate — the raw facts are scanned once and reduced to
    |users|x|days| rows before any window; adding a horizon adds a
    frame, not a shuffle or a scan. The naive per-horizon self-join
    form pays a fact-table join per horizon. Sums cross engines as
    decimal (order-independent), rounded only at the edge."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.col("value").cast("decimal(30,8)").alias("v"),
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    ).withColumn(
        "d_num", F.datediff("day", F.lit("1970-01-01").cast("date"))
    )
    base = Window.partitionBy("user_id").orderBy("d_num")
    w7 = base.rangeBetween(-6, 0)
    w28 = base.rangeBetween(-27, 0)
    return daily.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n_1d"),
        F.sum("n").over(w7).cast("bigint").alias("n_7d"),
        F.sum("n").over(w28).cast("bigint").alias("n_28d"),
        _fround(F.sum("sv").over(w7).cast("double"), 2).alias("v_7d"),
        _fround(F.sum("sv").over(w28).cast("double"), 2).alias("v_28d"),
    )


def q_new_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting from SKETCH DIFFERENCES: users active today
    but silent over the prior 7 days, estimated as est(window incl
    today) - est(window excl today) over the SAME daily sketch table
    hll_sliding_distinct maintains — new-user counting without an
    anti-join against a week of raw facts. Set-difference via
    inclusion-exclusion compounds two estimates, so est_ok uses a
    window-size-relative bound (max(3, 5% of the exact 8-day window));
    the exact side (anti-join) exists only to make that claim
    driver-checkable."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    ).withColumn(
        "d_num", F.datediff("day", F.lit("1970-01-01").cast("date"))
    )
    base = Window.orderBy("d_num")
    w_incl = base.rangeBetween(-7, 0)
    w_excl = base.rangeBetween(-7, -1)
    est = daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w_incl)).alias(
            "est_incl"
        ),
        # first day has an empty exclusive window: no sketch to merge,
        # so the estimate is 0 new = everything — guard with coalesce
        F.coalesce(
            F.hll_sketch_estimate(
                F.hll_union_agg("sk").over(w_excl)
            ),
            F.lit(0).cast("bigint"),
        ).alias("est_excl"),
    ).withColumn("est_new", F.col("est_incl") - F.col("est_excl"))
    du = ev.distinct()
    prior = (
        du.alias("d")
        .join(
            du.alias("p"),
            (F.col("p.user_id") == F.col("d.user_id"))
            & (
                F.col("p.day").between(
                    F.date_sub(F.col("d.day"), 7),
                    F.date_sub(F.col("d.day"), 1),
                )
            ),
            "left_anti",
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("d.user_id").alias("n_new_exact"))
    )
    window_exact = (
        du.alias("d2")
        .select("day")
        .distinct()
        .alias("dd")
        .join(
            du.alias("e"),
            F.col("e.day").between(
                F.date_sub(F.col("dd.day"), 7), F.col("dd.day")
            ),
        )
        .groupBy(F.col("dd.day").alias("day"))
        .agg(F.countDistinct("e.user_id").alias("n_window"))
    )
    return (
        est.join(prior, "day")
        .join(window_exact, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_new_exact").cast("bigint").alias("n_new_exact"),
            (
                F.abs(F.col("est_new") - F.col("n_new_exact"))
                <= F.greatest(F.lit(3.0), F.lit(0.05) * F.col("n_window"))
            ).alias("est_ok"),
        )
    )


def q_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 FORWARD as-of join with tolerance (pandas merge_asof
    parity, completing the as-of family): each click annotated with the
    user's NEXT purchase, NULLed when it falls outside a 2-day
    tolerance. Same union + single-key-shuffle window plan as the
    backward join — direction only flips the window order, tolerance
    is a post-merge projection — so there is still no range-join
    explosion and the skew ceiling is one user's event volume."""
    from aproximacion_1_etl_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
    )
    out = asof_join(
        clicks,
        buys,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["p_id", "p_value"],
        tiebreak="p_id",
        direction="forward",
        tolerance_seconds=172800,
    )
    return out.select(
        "event_id",
        "user_id",
        _ts_str("ts").alias("ts"),
        F.col("asof_p_id").alias("purchase_id"),
        _fround(F.col("asof_p_value"), 2).alias("purchase_value"),
        _ts_str("asof_ts").alias("purchase_ts"),
    )


def q_funnel_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 conversion-LAG percentiles: how long after a click does
    the purchase come — the timing view the step-count funnel
    (event_funnel) lacks. Each click gets its next purchase within a
    7-day tolerance from the SAME forward as-of join
    asof_forward_tolerance uses; the lag is exact integer seconds, so
    the p50/p90 selection runs the weighted_quantiles crossing-row
    trick (cum*den >= tot*num on bigint counts — zero float rank
    math) over the per-LAG-value aggregate, whose size is BOUNDED by
    the tolerance window (<= 604800 rows at any SF)."""
    from aproximacion_1_etl_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    )
    j = asof_join(
        clicks,
        buys,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["p_id"],
        tiebreak="p_id",
        direction="forward",
        tolerance_seconds=604800,
    )
    # count the left relation directly — asof_join is left-preserving,
    # and this avoids re-running the union+window asof plan for a count
    n_clicks = clicks.agg(F.count("*").cast("bigint").alias("nc"))
    lags = (
        j.filter(F.col("asof_p_id").isNotNull())
        .select(
            (
                F.unix_timestamp("asof_ts") - F.unix_timestamp("ts")
            ).alias("lag_s")
        )
        .groupBy("lag_s")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    w_cum = Window.orderBy("lag_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = lags.select(
        "lag_s",
        F.sum("c").over(w_cum).alias("cw"),
        F.sum("c").over(Window.partitionBy()).alias("tw"),
    )

    stats = cum.agg(
        F.max("tw").cast("bigint").alias("n_converted"),
        _crossing_pick("lag_s", 1, 2).cast("bigint").alias("p50_lag_s"),
        _crossing_pick("lag_s", 9, 10).cast("bigint").alias("p90_lag_s"),
    )
    return stats.crossJoin(F.broadcast(n_clicks)).select(
        F.col("nc").alias("n_clicks"),
        "n_converted",
        _fround(
            F.col("n_converted").cast("double")
            / F.col("nc").cast("double"),
            4,
        ).alias("conversion_rate"),
        "p50_lag_s",
        "p90_lag_s",
    )


def q_cycle_time_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 fulfilment CYCLE-TIME decomposition: p50/p90 of each
    per-order stage (order to first ship, order to last ship, and the
    within-order ship spread) from ONE scan — the facts aggregate once
    to order grain, a stack() unpivot emits (stage, lag-days) rows,
    lags are exact integer day differences, and the per-stage
    percentiles use the crossing-row selection on the per-(stage, lag)
    count aggregate (cum*den >= tot*num integer cross-multiplication —
    no float rank math, no per-stage job)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
    j = per_order.join(
        o.select("o_orderkey", "o_orderdate"),
        per_order["l_orderkey"] == F.col("o_orderkey"),
    )
    lagged = j.select(
        F.expr(
            "stack(3,"
            " 'order_to_first_ship', datediff(first_ship, o_orderdate),"
            " 'order_to_last_ship', datediff(last_ship, o_orderdate),"
            " 'ship_spread', datediff(last_ship, first_ship)"
            ") AS (stage, lag_d)"
        )
    )
    counts = lagged.groupBy("stage", "lag_d").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy("stage")
        .orderBy("lag_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        "stage",
        "lag_d",
        F.sum("c").over(w_cum).alias("cw"),
        F.sum("c").over(Window.partitionBy("stage")).alias("tw"),
    )

    return cum.groupBy("stage").agg(
        F.max("tw").cast("bigint").alias("n_orders"),
        _crossing_pick("lag_d", 1, 2).cast("int").alias("p50_days"),
        _crossing_pick("lag_d", 9, 10).cast("int").alias("p90_days"),
    )


__all__ = [
    "q_asof_latest_event",
    "q_range_join_events",
    "q_window_running_sum",
    "q_trailing_range_avg",
    "q_ntile_quartiles",
    "q_sessionize",
    "q_session_window_rollup",
    "q_window_lag_lead",
    "q_window_percent_rank",
    "q_window_ignore_nulls",
    "q_gap_fill_daily",
    "q_cohort_retention",
    "q_event_funnel",
    "q_decayed_user_value",
    "q_sequence_pattern_match",
    "q_max_concurrency",
    "q_interpolate_missing",
    "q_multi_window_features",
    "q_new_users_daily",
    "q_asof_forward_tolerance",
    "q_funnel_conversion_time",
    "q_cycle_time_stages",
]
