"""Declared queries — one per implemented operator (SURVEY.md §2).

Each function takes (spark, sf_dir) and returns a DataFrame; the
matching DuckDB oracle lives in ``oracles.py`` under the same key.
Conventions that keep Spark<->DuckDB value-hashes stable (SURVEY.md §7):

- every computed column is aliased identically in both engines;
- doubles rounded (2-4 decimals), timestamps emitted as formatted
  strings, integer aggregates cast to BIGINT;
- every ranking window has a deterministic tiebreaker.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aproximacion_1_etl_spark.functions.cleaning import (
    cast_to_ddl,
    default_fill,
    empty_to_null,
    lenient_ts,
    strip_digits,
    try_ts,
)
from aproximacion_1_etl_spark.operators.explode import (
    explode_json_array,
    pack_children_as_json,
)
from aproximacion_1_etl_spark.operators.refine import (
    child_rollup,
    dedup_latest,
    first_scheduled,
    latest_child_attrs,
    merge_upsert,
    nth_event,
    visit_order,
)
from aproximacion_1_etl_spark.operators.joins import (
    asof_join,
    range_join_rollup,
)
from aproximacion_1_etl_spark.operators.refine import visit_columns
from aproximacion_1_etl_spark.plans.runner import flagship, run_daily
from aproximacion_1_etl_spark.sources.json_ingest import (
    read_day_files,
    split_corrupt,
)
from aproximacion_1_etl_spark.sources.rest import fetch_distributed, task_grid
from aproximacion_1_etl_spark.sources.tables import load_table
from aproximacion_1_etl_spark.streaming.events import run_available_now
from aproximacion_1_etl_spark.text.analysis import (
    fingerprint,
    lang_id,
    quality_score,
    regex_token_count,
    token_count,
)
from aproximacion_1_etl_spark.text.dedup import (
    dedup_clusters,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from aproximacion_1_etl_spark.text.multimodal import (
    attach_media,
    decode_stub_features,
)
from aproximacion_1_etl_spark.text.vector import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
    embedding_near_dup,
    embedding_near_dup_lsh,
)

_fmt = "yyyy-MM-dd HH:mm:ss"


def _fround(col, n: int = 2):
    """Engine-portable deterministic rounding: floor(x*10^n + 0.5)/10^n
    in IEEE double — identical in any engine. Native round() half-way
    semantics differ (Spark rounds the shortest decimal repr HALF_UP,
    DuckDB rounds the binary value numerically), which breaks oracle
    hash-matching whenever a value lands exactly on .xx5."""
    f = float(10 ** n)
    return F.floor(col * F.lit(f) + F.lit(0.5)) / F.lit(f)


def _dsum(expr, scale: int = 2):
    """Deterministic money sum: cast each double to decimal before
    summing so the result is independent of partition/summation order
    (and identical across engines), then back to double, floor-rounded."""
    return _fround(F.sum(expr.cast("decimal(30,8)")).cast("double"), scale)


def _ts_str(col) -> F.Column:
    return F.date_format(col, _fmt)


def _reclaimed(df: DataFrame, *paths: str) -> DataFrame:
    """Materialize a bounded result locally and reclaim the temp dirs
    its plan reads from. Roundtrip/streaming keys write to mkdtemp and
    would otherwise return a LAZY frame that still scans the dir,
    pinning it forever (one leaked dir per invocation). Every caller's
    result is small by construction (|days|-, |statuses|-,
    |collision-pair|-bounded aggregates — never a fact relation), so
    collecting it onto the driver is safe; the rebuilt local relation
    has no file dependency, and rmtree in ``finally`` runs even when
    the collect itself fails."""
    import shutil

    try:
        return df.sparkSession.createDataFrame(df.collect(), df.schema)
    finally:
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)


def _reclaimed_dist(df: DataFrame, *paths: str) -> DataFrame:
    """``_reclaimed`` for FACT-SIZED results: ``localCheckpoint(eager)``
    materializes the partitions in the executors' block manager —
    distributed, never on the driver — which cuts the plan's lineage to
    the temp dirs so they can be reclaimed immediately. Keys whose
    result is a maintained view / full relation (streaming_ivm_join,
    cdf_join_maintenance) must use THIS one: collect()-and-rebuild
    would pull the whole relation through the driver (an OOM at scale
    and a double serialization at any size)."""
    import shutil

    try:
        return df.localCheckpoint(eager=True)
    finally:
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)


def _artifact_key(sf_dir: str, table: str) -> tuple:
    """Cache key for memoized model artifacts: (sf_dir, source-parquet
    mtime) so a testdata regeneration inside one long-lived process
    retrains instead of serving a stale model. A missing file keys on
    -1 and lets the downstream read raise the real error."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(path):
            mt = max(
                (os.path.getmtime(os.path.join(path, f))
                 for f in os.listdir(path)),
                default=os.path.getmtime(path),
            )
        else:
            mt = os.path.getmtime(path)
    except OSError:
        mt = -1.0
    return (sf_dir, mt)


# ---------------------------------------------------------------- core ETL


def q_flagship_order_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's master+children lifecycle rollup (dedup -> child agg join -> latest event) in one plan."""
    return flagship(spark, sf_dir)


def q_m1_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: one surviving row per customer — their latest order."""
    orders = load_table(spark, sf_dir, "orders")
    out = dedup_latest(
        orders,
        keys=["o_custkey"],
        order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        _ts_str("o_orderdate").alias("latest_orderdate"),
        "o_orderstatus",
    )


def q_m2_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: full-outer upsert — updates win, unmatched master survives,
    new keys insert."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("totalprice"),
    )
    master = base.filter(F.col("o_orderkey") % 3 != 0)
    updates = base.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.round(F.col("totalprice") + 1.0, 2).alias("totalprice"),
    )
    return merge_upsert(master, updates, keys=["o_orderkey"])


def q_m4_latest_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: latest event attributes per user via max_by."""
    events = load_table(spark, sf_dir, "events")
    out = latest_child_attrs(
        events, ["user_id"], ["event_type", "value"], "ts", "event_id"
    )
    return out.select(
        "user_id",
        F.col("latest_event_type"),
        _fround(F.col("latest_value"), 2).alias("latest_value"),
    )


def q_m5_child_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5/M7: per-order child rollup (count / sum / conditional count)."""
    li = load_table(spark, sf_dir, "lineitem")
    return child_rollup(
        li,
        keys=["l_orderkey"],
        aggs={
            "n_items": F.count("*"),
            "sum_qty": F.round(F.sum("l_quantity"), 2),
            "revenue": _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            "n_returned": F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).cast("bigint"),
        },
    )


def q_m6_case_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: CASE-derived attribute columns + rollup."""
    orders = load_table(spark, sf_dir, "orders")
    cat = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        orders.withColumn("price_band", cat)
        .groupBy("price_band", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _fround(
                F.sum(F.col("o_totalprice").cast("decimal(30,8)")).cast(
                    "double"
                )
                / F.count("*"),
                2,
            ).alias("avg_price"),
        )
    )


def q_m8_nth_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 (insert_table_temp(2)): each user's 2nd event."""
    events = load_table(spark, sf_dir, "events")
    out = nth_event(events, ["user_id"], "ts", "event_id", n=2)
    return out.select(
        "user_id", "event_id", "event_type", _ts_str("ts").alias("event_ts")
    )


def q_m8_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 (insert_table_temp(0)): each user's last event."""
    events = load_table(spark, sf_dir, "events")
    out = nth_event(events, ["user_id"], "ts", "event_id", n=0)
    return out.select(
        "user_id", "event_id", "event_type", _ts_str("ts").alias("event_ts")
    )


def q_m10_first_scheduled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10: earliest event per user."""
    events = load_table(spark, sf_dir, "events")
    out = first_scheduled(events, ["user_id"], "ts")
    return out.select(
        "user_id", _ts_str("scheduled_ts").alias("scheduled_ts")
    )


def q_m11_visit_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11: materialized visit ranking, first 3 visits per user."""
    events = load_table(spark, sf_dir, "events")
    out = visit_order(events, ["user_id"], "ts", "event_id")
    return out.filter(F.col("visit_rank") <= 3).select(
        "user_id",
        "event_id",
        F.col("visit_rank").cast("bigint").alias("visit_rank"),
        _ts_str("ts").alias("visit_ts"),
    )


def q_f2_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F5 + P12: children -> JSON-string array in parent -> from_json
    + explode with parent-key carry. Round-trips to the original child
    table, which is exactly what the oracle checks."""
    li = load_table(spark, sf_dir, "lineitem")
    packed = pack_children_as_json(
        li,
        parent_keys=["l_orderkey"],
        child_cols=["l_linenumber", "l_quantity", "l_returnflag"],
        json_col="items_json",
    )
    return explode_json_array(
        packed,
        json_col="items_json",
        element_schema_ddl="l_linenumber INT, l_quantity DOUBLE, l_returnflag STRING",
        parent_keys=["l_orderkey"],
        projections={
            "l_linenumber": "l_linenumber",
            "l_quantity": "l_quantity",
            "l_returnflag": "l_returnflag",
        },
    )


def q_p3_p5_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4/P5: empty->null, default fill, digit-strip."""
    c = load_table(spark, sf_dir, "customer")
    seg_dirty = F.when(F.col("c_custkey") % 5 == 0, F.lit("")).otherwise(
        F.col("c_mktsegment")
    )
    return c.select(
        "c_custkey",
        strip_digits(F.col("c_name")).alias("clean_name"),
        empty_to_null(seg_dirty).alias("seg_or_null"),
        default_fill(seg_dirty, "NONE").alias("seg_filled"),
    )


def q_p6_cast_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: declared string-DDL schema cast (select + cast + prune)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = cast_to_ddl(
        li, "l_orderkey STRING, l_linenumber BIGINT, l_tax DOUBLE"
    )
    return out.select(
        "l_orderkey", "l_linenumber", F.round("l_tax", 2).alias("l_tax")
    )


def q_p7_try_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: strict-pattern parse, NULL on failure (round-trip + a column
    that always fails to parse)."""
    ev = load_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    return ev.select(
        "event_id",
        F.date_format(try_ts(iso), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "parsed_ts"
        ),
        try_ts(F.col("props")).isNull().alias("bad_parse_null"),
    )


def q_p8_lenient_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: lenient multi-format parse via coalesce fallback chain, over
    four encodings of the same date — slashed datetime, date-only,
    offset-suffixed ISO (+03:00, which normalizes to the UTC session
    tz, i.e. shifts the instant back 3h), and milli-fraction ISO."""
    orders = load_table(spark, sf_dir, "orders")
    m = F.col("o_orderkey") % 4
    mixed = (
        F.when(m == 0, F.date_format("o_orderdate", "yyyy/MM/dd HH:mm:ss"))
        .when(m == 1, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(
            m == 2,
            F.concat(
                F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"),
                F.lit("+03:00"),
            ),
        )
        .otherwise(
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss.SSS")
        )
    )
    return orders.select(
        "o_orderkey", _ts_str(lenient_ts(mixed)).alias("parsed_date")
    )


def q_p12_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12/§2.7 JSON: get_json_object over the props column + rollup."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            _fround(F.avg("k"), 4).alias("avg_k"),
        )
    )


def q_s1_rest_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2: distributed paginated fetch over a (day, page) task grid
    with a deterministic fake HTTP client."""
    from datetime import date

    days = [date(2024, 1, d) for d in (1, 2, 3)]

    def fake_fetch(fetch_date: str, page: int) -> list[dict]:
        return [
            {
                "order_id": f"{fetch_date}#p{page}#r{i}",
                "amount": float(page * 100 + i),
            }
            for i in range(5)
        ]

    tasks = task_grid(spark, days, max_pages=2)
    return fetch_distributed(
        tasks, fake_fetch, "order_id STRING, amount DOUBLE"
    )


def q_s3_s6_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S5+S6+F6: write day-partitioned JSON, read back with metadata
    exclusion + corrupt-record tolerance, aggregate per day."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 1000
    )
    day_df = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ingest_date"),
    )
    path = tempfile.mkdtemp(prefix="graft_json_")
    day_df.write.mode("overwrite").partitionBy("ingest_date").json(path)
    back = read_day_files(
        spark,
        path,
        schema_ddl="o_orderkey BIGINT, o_orderstatus STRING, totalprice DOUBLE",
        multiline=False,
    )
    clean, _corrupt = split_corrupt(back)
    out = clean.groupBy("ingest_date").agg(
        F.count("*").alias("n_orders"),
        _dsum(F.col("totalprice")).alias("day_total"),
    )
    return _reclaimed(out, path)


def q_s9_enrichment_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: gated broadcast-lookup enrichment (the geo-service analog)."""
    from aproximacion_1_etl_spark.sources.rest import enrich_segmentation

    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    lookup = nation.select(
        F.col("n_nationkey").alias("destination_structure_id"),
        F.col("n_name").alias("segmentation"),
    )
    cust = c.select(
        "c_custkey",
        F.col("c_nationkey").alias("destination_structure_id"),
    )
    out = enrich_segmentation(cust, lookup, gate_ids=(1, 2, 3))
    return out.select("c_custkey", "destination_structure_id", "segmentation")


def q_work_table_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/M3-M13: the full refinement chain — the reference's 29
    sequential stored procedures as ONE Catalyst plan producing the
    delivery_order_work-equivalent table."""
    return run_daily(spark, sf_dir)


def q_m9_visit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9: first-3-visits pivoted wide (visit_n_ts / visit_n_type)."""
    events = load_table(spark, sf_dir, "events")
    out = visit_columns(
        events, ["user_id"], "ts", "event_id", ["event_type"], n_visits=3
    )
    return out.select(
        "user_id",
        *[
            c
            for n in (1, 2, 3)
            for c in (
                _ts_str(f"visit_{n}_ts").alias(f"visit_{n}_ts"),
                F.col(f"visit_{n}_event_type"),
            )
        ],
    )


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


def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 shuffle-reduction join: lineitem x urgent orders through a
    Bloom bitmap built over the small side's keys (8 KB on the driver,
    baked into the big scan as a literal word array) — non-matching
    lineitem rows drop MAP-SIDE before the shuffle, and the exact join
    removes the <1% false positives, so the result is row-identical to
    the plain join the oracle runs. The explicit, guaranteed form of
    Spark's cost-based runtime bloomFilter rewrite
    (operators/joins.py::bloom_prune_join)."""
    from aproximacion_1_etl_spark.operators.joins import bloom_prune_join

    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderdate")
    joined = bloom_prune_join(li, urgent, "l_orderkey", "o_orderkey")
    return joined.groupBy(
        F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
            "order_month"
        )
    ).agg(
        F.count("*").cast("bigint").alias("n_items"),
        _dsum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("revenue"),
    )


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 column-level data profiling (the deequ/dbt-docs surface):
    one row per orders column — null count, exact distinct count, and
    min/max rendered as strings. The profile any
    ingestion gate diffs run-over-run before accepting a batch. Exact
    distincts keep the key value-checkable; at 100 TB swap in
    approx_count_distinct per column (sketch merge instead of exact
    distinct state).

    Built on the mergeable state helpers (functions/profile.py): a
    moments pass (counts/nulls/typed extrema, one fused aggregation)
    plus a stacked distinct-value pass. Two scans beat the previous
    single-scan N-way ``countDistinct``: Catalyst's expand rewrite
    multiplied every row by |columns| before aggregating — measured
    3.3 s -> sub-second at sf0.1 for the same answer."""
    from aproximacion_1_etl_spark.functions.profile import (
        distinct_state,
        profile_from_states,
        profile_state,
    )

    o = load_table(spark, sf_dir, "orders")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    return profile_from_states(
        profile_state(o, cols), distinct_state(o, cols), cols
    )


def q_incremental_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 MERGEABLE table profile — the run-over-run diff gate the
    reference's daily loop (app.py:142-147) actually needs:
    ``table_profile`` rescans the table; here the standing table's
    profile state (1-row typed moments + a distinct-value relation,
    functions/profile.py) absorbs a new day's batch WITHOUT rescanning
    history — counts add, extrema min/max, distinct states union.
    The last two months play the incoming batch; the emitted profile
    is the MERGED one, and ``matches_full`` asserts per column that
    merge == recompute (the oracle pins it TRUE, so a broken merge
    algebra fails the hash gate, not just a pytest)."""
    from aproximacion_1_etl_spark.functions.profile import (
        distinct_state,
        merge_profile_states,
        profile_from_states,
        profile_state,
    )

    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    o = load_table(spark, sf_dir, "orders")
    hist = o.filter(F.col("o_orderdate") < "2001-06-01")
    batch = o.filter(F.col("o_orderdate") >= "2001-06-01")

    merged = profile_from_states(
        merge_profile_states(
            [profile_state(hist, cols), profile_state(batch, cols)], cols
        ),
        distinct_state(hist, cols)
        .unionByName(distinct_state(batch, cols))
        .distinct(),
        cols,
    )
    full = profile_from_states(
        profile_state(o, cols), distinct_state(o, cols), cols
    )
    f = full.select(
        "column_name",
        *[
            F.col(c).alias("_f_" + c)
            for c in ["n_rows", "n_null", "n_distinct", "min_str", "max_str"]
        ],
    )
    same = (
        (F.col("n_rows") == F.col("_f_n_rows"))
        & (F.col("n_null") == F.col("_f_n_null"))
        & (F.col("n_distinct") == F.col("_f_n_distinct"))
        & F.col("min_str").eqNullSafe(F.col("_f_min_str"))
        & F.col("max_str").eqNullSafe(F.col("_f_max_str"))
    )
    return merged.join(f, "column_name").select(
        "column_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_str",
        "max_str",
        same.alias("matches_full"),
    )


def q_streaming_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + §2.10: the mergeable profile AS A STREAM — completes the
    batch / incremental / streaming trio (table_profile /
    incremental_profile / here), the same topology as the dedup
    signature store and the IVF stats store: orders arrive in two
    date-ordered waves; foreachBatch folds each wave's 1-row typed
    moment state into the persisted state (counts add, extrema
    min/max) and appends the wave's distinct-value pairs to the value
    store. Per-batch cost is O(|batch| + state); no batch ever
    rescans another. The final rendered profile must equal a full
    recompute — the oracle is the full-table profile."""
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.functions.profile import (
        distinct_state,
        merge_profile_states,
        profile_from_states,
        profile_state,
    )

    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    o = load_table(spark, sf_dir, "orders").select(*cols)
    base = tempfile.mkdtemp(prefix="graft_spf_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_spf_")
    src = os.path.join(base, "src")
    mom_log = os.path.join(base, "moments")
    val_store = os.path.join(base, "values")

    def handle_batch(batch, batch_id: int) -> None:
        bspark = batch.sparkSession
        mom = profile_state(batch, cols)
        if os.path.isdir(mom_log):
            prior = bspark.read.parquet(mom_log)
            # fold: prior state + this wave's state -> one-row state
            mom = merge_profile_states([prior, mom], cols)
        mom.write.mode("overwrite").parquet(os.path.join(base, "_mom_next"))
        # two-step swap: the fold READS mom_log, so write aside first
        folded = bspark.read.parquet(os.path.join(base, "_mom_next"))
        folded.write.mode("overwrite").parquet(mom_log)
        distinct_state(batch, cols).write.mode("append").parquet(val_store)

    try:
        o.filter(F.col("o_orderdate") < "1998-01-01").coalesce(1).write.parquet(
            os.path.join(src, "w1")
        )
        o.filter(
            F.col("o_orderdate") >= "1998-01-01"
        ).coalesce(1).write.parquet(os.path.join(src, "w2"))
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        schema = (
            "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
            "o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
            "o_orderpriority STRING"
        )
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        out = profile_from_states(
            spark.read.parquet(mom_log),
            spark.read.parquet(val_store).distinct(),
            cols,
        )
        return _reclaimed(out, base, ckpt)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def q_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 profiling: equi-width numeric histogram of order totals —
    20 buckets between the exact min/max, one aggregation for bounds
    (broadcast back as two scalars) + one map-side bucket assignment +
    one count aggregation. Bucket ids are pure IEEE arithmetic
    (least(B, floor((x-lo)/w)+1)) so both engines bucket identically;
    counts are mergeable (a daily batch's histogram adds into a
    standing one bucket-wise, like every profile state here). At
    100 TB this is the two-pass exact form; the one-pass approximate
    form swaps the bounds pass for fixed domain knowledge."""
    o = load_table(spark, sf_dir, "orders")
    n_b = 20
    bounds = o.agg(
        F.min("o_totalprice").alias("_lo"), F.max("o_totalprice").alias("_hi")
    )
    w = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_b))
    bucketed = o.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(n_b),
            (F.floor((F.col("o_totalprice") - F.col("_lo")) / w) + 1).cast(
                "int"
            ),
        ).alias("bucket"),
        "_lo",
        "_hi",
    )
    return (
        bucketed.groupBy("bucket", "_lo", "_hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            _fround(
                F.col("_lo") + (F.col("bucket") - 1) * (
                    (F.col("_hi") - F.col("_lo")) / F.lit(float(n_b))
                ),
                4,
            ).alias("bucket_lo"),
            _fround(
                F.col("_lo") + F.col("bucket") * (
                    (F.col("_hi") - F.col("_lo")) / F.lit(float(n_b))
                ),
                4,
            ).alias("bucket_hi"),
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("bucket")
    )


def _hist_bucket(value, lo: float, width: float, n_b: int):
    """THE bucket-assignment expression for the equi-width histogram
    state: least(n_b, floor((v - lo)/width) + 1), pure IEEE arithmetic
    so every engine (and every batch of a stream) buckets identically.
    One definition shared by the batch, incremental, and streaming
    quantile keys — the geometry cannot drift between them."""
    return F.least(
        F.lit(n_b),
        (F.floor((value - F.lit(lo)) / F.lit(width)) + 1).cast("int"),
    )


def _cum_hist(merged: DataFrame) -> DataFrame:
    """Cumulative walk over a merged (bucket, n) histogram state: adds
    ``cum`` and ``cum_before``. A window over |bins| rows — bounded,
    single light task."""
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return merged.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "cum_before", F.col("cum") - F.col("n")
    )


def _histogram_quantile_report(
    cum: DataFrame,
    exact_src: DataFrame,
    lo: float,
    width: float,
    total: int,
) -> DataFrame:
    """Shared render step of the mergeable-quantile keys: interpolate
    p50/p90/p99 from a cumulative histogram state (``cum``: bucket, n,
    cum, cum_before) and emit (q, exact_value, est_ok) — exact from a
    ``percentile`` reference aggregate over ``exact_src.value``.

    The bound behind est_ok is the one the bucket geometry actually
    GUARANTEES: for rank r = q*(n-1)+1, the order statistics x_floor(r)
    and x_ceil(r) land in buckets b1 <= b <= b2 where b is the located
    bucket (cum_before < r <= cum), so the estimate satisfies
    x_floor(r) - width <= est <= x_ceil(r) + width for ANY data
    distribution. A naive |est - exact| <= k*width claim is false for
    gapped/bimodal data (the interpolated exact can sit in an empty
    region many buckets from both order statistics); this one is
    provable, so the oracle's est_ok=TRUE is a theorem, not a fixture
    property.

    The exact side stays LAZY: the nine percentile fractions depend
    only on ``total`` (a driver scalar the caller already holds from
    its state), so the reference aggregate rides the final action as a
    1-row crossJoin — no eager .first() and no extra scan of
    ``exact_src`` (measured: an eager exact side doubled the key)."""
    import math

    spark = cum.sparkSession
    qs = [0.5, 0.9, 0.99]
    fracs = []
    for q in qs:
        r = q * (total - 1) + 1.0
        if total > 1:
            fracs += [
                (math.floor(r) - 1.0) / (total - 1),
                (math.ceil(r) - 1.0) / (total - 1),
            ]
        else:
            fracs += [0.0, 0.0]
    # one source of truth for the (q, frac_lo, frac_hi) interleave —
    # the element_at stride below (i*3 + 1..3) indexes this layout
    arr = ", ".join(
        f"{float(p)!r}D"
        for i, q in enumerate(qs)
        for p in (q, fracs[2 * i], fracs[2 * i + 1])
    )
    ex_agg = exact_src.agg(
        F.expr(f"percentile(value, array({arr}))").alias("ex")
    )
    qpos = spark.createDataFrame(
        [(q, i) for i, q in enumerate(qs)], "q DOUBLE, i INT"
    )
    exact = ex_agg.crossJoin(F.broadcast(qpos)).select(
        "q",
        F.element_at("ex", F.col("i") * 3 + 1).alias("exact_value"),
        F.element_at("ex", F.col("i") * 3 + 2).alias("ex_lo"),
        F.element_at("ex", F.col("i") * 3 + 3).alias("ex_hi"),
    )
    # continuous rank r = p*(n-1)+1 over the merged counts; the one
    # bucket with cum_before < r <= cum holds it
    r = F.col("q") * F.lit(float(total - 1)) + F.lit(1.0)
    located = (
        cum.crossJoin(F.broadcast(exact))
        .filter((F.col("cum_before") < r) & (r <= F.col("cum")))
        .select(
            "q",
            "exact_value",
            "ex_lo",
            "ex_hi",
            (
                F.lit(lo)
                + (F.col("bucket") - 1) * F.lit(width)
                + (r - F.col("cum_before")) / F.col("n") * F.lit(width)
            ).alias("est"),
        )
    )
    tol = F.lit(width + 1e-6)
    return located.select(
        "q",
        _fround(F.col("exact_value"), 4).alias("exact_value"),
        (
            (F.col("est") >= F.col("ex_lo") - tol)
            & (F.col("est") <= F.col("ex_hi") + tol)
        ).alias("est_ok"),
    )


def q_incremental_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 MERGEABLE quantile estimation: per-day equi-width
    histogram partials (the daily batch state) merge bucket-wise, and
    p50/p90/p99 are interpolated from the merged state — no global
    sort, no history rescan, O(|bins|) state. The estimate's error is
    bounded by the bucket geometry (the located rank and the true
    quantile can straddle at most adjacent buckets): |est - exact| <=
    2 bucket widths. Following the engine's approx-sketch convention
    (approx_distinct, heavy_hitters_cms), the hashed output carries
    the EXACT quantile (engine-computable on both sides) plus the
    boolean bound check — estimates themselves are representation-
    specific, the bound is the contract. The cumulative walk is a
    window over |bins| rows (512) — bounded, single light task. The
    O(|bins|) state is materialized once on the driver (it IS the
    thing a daily loop would persist) and the grand total falls out of
    it as sum(n) — no extra count() pass over the facts."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("value"),
        F.to_date("ts").alias("d"),
    )
    n_b = 512
    b = ev.agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    ).collect()[0]
    lo, hi = float(b["_lo"]), float(b["_hi"])
    width = (hi - lo) / n_b if hi > lo else 1.0

    # per-day partial histograms, then the bucket-wise state merge
    part = (
        ev.select("d", _hist_bucket(F.col("value"), lo, width, n_b)
                  .alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("n"))
    )
    state = (
        part.groupBy("bucket")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in state)
    merged = spark.createDataFrame(state, "bucket INT, n BIGINT")
    return _histogram_quantile_report(
        _cum_hist(merged), ev, lo, width, total
    )


def q_streaming_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + §2.10: mergeable quantiles AS A STREAM — completes the
    batch / incremental / streaming trio for the quantile state (the
    profile-store topology): events arrive in two date-ordered waves;
    foreachBatch buckets ONLY its own wave against the standing bucket
    geometry (fixed lo/width — domain knowledge in production, one
    bounds pass here) and folds the counts into the persisted
    histogram state. Per-batch cost O(|batch| + |bins|); the final
    p50/p90/p99 render from the folded state must satisfy the same
    provable bucket-geometry bound against the exact full-data order
    statistics — the oracle is identical to incremental_quantiles by
    construction. The histogram state lives in a versioned snapshot
    table (write_snapshot / committed_metas): the batch id travels
    inside the commit, so a recovered stream that re-delivers the
    in-flight micro-batch skips it instead of double-counting (the
    count fold is NOT idempotent), and publish is one atomic manifest
    flip — no torn two-step overwrite window."""
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.sources.versioned import (
        committed_metas,
        current_version,
        read_snapshot,
        write_snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("value"),
        F.col("ts"),
    )
    n_b = 512
    b = ev.agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    ).collect()[0]
    lo, hi = float(b["_lo"]), float(b["_hi"])
    width = (hi - lo) / n_b if hi > lo else 1.0

    base = tempfile.mkdtemp(prefix="graft_sq_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_sq_")
    src = os.path.join(base, "src")
    hist_log = os.path.join(base, "hist")

    def handle_batch(batch, batch_id: int) -> None:
        if str(batch_id) in committed_metas(hist_log):
            return
        bspark = batch.sparkSession
        part = (
            batch.select(
                _hist_bucket(F.col("value"), lo, width, n_b)
                .alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n"))
        )
        if current_version(hist_log) is not None:
            prior = read_snapshot(bspark, hist_log)
            part = (
                prior.unionByName(part)
                .groupBy("bucket")
                .agg(F.sum("n").cast("bigint").alias("n"))
            )
        write_snapshot(part, hist_log, meta=str(batch_id))

    try:
        # events are 2024-dated; mid-month cut makes BOTH waves carry
        # rows so the second batch folds into a non-trivial prior state
        cut = "2024-01-16"
        ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(
            os.path.join(src, "w1")
        )
        ev.filter(F.col("ts") >= cut).coalesce(1).write.parquet(
            os.path.join(src, "w2")
        )
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        q = (
            spark.readStream.schema("value DOUBLE, ts TIMESTAMP")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

        # the folded state carries the exact total as sum(n) — no
        # rescan of the source after the stream
        state = read_snapshot(spark, hist_log).collect()
        total = sum(r["n"] for r in state)
        merged = spark.createDataFrame(state, "bucket INT, n BIGINT")
        out = _histogram_quantile_report(
            _cum_hist(merged), ev, lo, width, total
        )
        return _reclaimed(out, base, ckpt)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 seasonality-aware anomaly detection: each (type, day)
    count is z-scored against the baseline of the SAME weekday slot —
    the guard plain z-scoring lacks (a quiet Sunday is normal, the
    same count on a Tuesday is an incident). Weekday index is pure
    integer date arithmetic ((day - epoch) % 7 — no locale/engine
    dayofweek convention in play); baseline moments are decimal sums
    per (type, slot); z uses identical IEEE expressions on both
    engines with a var<=0 guard. Everything after the daily rollup is
    |types x days|-sized."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("x"))
    wk = daily.withColumn(
        "wd",
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) % 7,
    )
    base = wk.groupBy("event_type", "wd").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(38,18)")).cast("double").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)"))
        .cast("double")
        .alias("q"),
    )
    j = wk.join(base, ["event_type", "wd"])
    mean = F.col("s") / F.col("n")
    var = F.col("q") / F.col("n") - mean * mean
    z = F.when(var <= 0, F.lit(0.0)).otherwise(
        (F.col("x") - mean) / F.sqrt(var)
    )
    return j.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.col("x").cast("bigint").alias("n_events"),
        _fround(z, 4).alias("z"),
        (F.abs(_fround(z, 4)) > F.lit(2.0)).alias("is_anomaly"),
    )


def q_per_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 many-models training: one closed-form OLS fit PER customer
    segment (y = order total ~ account balance) from a SINGLE
    aggregation pass — the distributed pattern for training thousands
    of small models at once (per-entity forecasters, per-domain
    calibrators): no per-model job, no Python loop, the per-group
    moment vector (n, Sx, Sy, Sxx, Sxy, Syy) is one map-side-combinable
    groupBy and the normal-equation solve is closed-form column
    algebra on the 5-row result. Decimal moment sums + identical IEEE
    double algebra on both engines keep slope/intercept/r2
    bit-checkable."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    d = o.join(
        F.broadcast(
            c.select("c_custkey", "c_mktsegment", "c_acctbal")
        ),
        o["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("x"),
        F.col("o_totalprice").alias("y"),
    )

    def dsum(e):
        return F.sum(e.cast("decimal(38,18)")).cast("double")

    m = d.groupBy("segment").agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return m.select(
        "segment",
        F.col("n").cast("bigint").alias("n"),
        _fround(slope, 6).alias("slope"),
        _fround((F.col("sy") - slope * F.col("sx")) / F.col("n"), 2).alias(
            "intercept"
        ),
        _fround(cov * cov / (varx * vary), 6).alias("r2"),
    )


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority x status (explicit value list =>
    no extra distinct-scan job; stable column set)."""
    o = load_table(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("n_p"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: (status, priority), (status), () in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def q_s8_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: unionByName across drifted schemas (missing columns -> NULL),
    the per-file-branch union tolerance of the reference's pipelines."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus"
    )
    b = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("totalprice")
    )
    return a.unionByName(b, allowMissingColumns=True)


def q_s4_metadata_sidecar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+F6: day-partitioned JSON write with injected corrupt lines,
    PERMISSIVE read with corrupt-record capture, per-day metadata
    sidecar {ingest_date, total_ordenes, fallos} written + read back —
    the reference's extraction-metadata contract (app.py:166-171)."""
    import os

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2001-06-01"
    )
    line = F.when(
        F.col("o_orderkey") % 97 == 0, F.lit("CORRUPT{{not json")
    ).otherwise(
        F.to_json(
            F.struct(
                F.col("o_orderkey"),
                F.col("o_orderstatus"),
                F.round("o_totalprice", 2).alias("totalprice"),
            )
        )
    )
    path = tempfile.mkdtemp(prefix="graft_sidecar_")
    # repartition by the partition column first: one file per day-dir
    # instead of (tasks x days) tiny files — the 100 TB-safe layout.
    o.select(
        line.alias("value"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ingest_date"),
    ).repartition("ingest_date").write.mode("overwrite").partitionBy(
        "ingest_date"
    ).text(path)
    back = (
        spark.read.schema(
            "o_orderkey BIGINT, o_orderstatus STRING, totalprice DOUBLE, "
            "_corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Corrupt lines parse to all-NULL data columns; counting off a data
    # column (o_orderkey, never null in valid rows) instead of
    # _corrupt_record avoids Spark's corrupt-record-only-query
    # restriction without caching the parse.
    meta = back.groupBy("ingest_date").agg(
        F.count("o_orderkey").alias("total_ordenes"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("fallos"),
    )
    meta_path = os.path.join(path, "_metadata_out")
    meta.coalesce(1).write.mode("overwrite").json(meta_path)
    out = spark.read.schema(
        "ingest_date STRING, total_ordenes BIGINT, fallos BIGINT"
    ).json(meta_path)
    return _reclaimed(out, path)


# ------------------------------------------------------- joins / aggregates


def q_join_enrichment_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension-join chain customer -> nation -> region."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            _fround(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti joins: customers with vs without orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    on = c["c_custkey"] == o["o_custkey"]
    with_orders = (
        c.join(o, on, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
    )
    without = (
        c.join(o, on, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without_orders"))
    )
    return (
        with_orders.join(without, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority) with subtotals + grand total."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over customer-key sets from two date halves."""
    o = load_table(spark, sf_dir, "orders")
    cut = "1998-01-01"
    h1 = o.filter(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    h2 = o.filter(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    n_both = h1.intersect(h2).agg(F.count("*").alias("n_both"))
    n_only_early = h1.exceptAll(h2.distinct()).agg(
        F.count("*").alias("n_only_early")
    )
    return n_both.crossJoin(n_only_early)


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


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: 20 most expensive orders (deterministic tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderstatus",
        )
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            _fround(F.avg("l_quantity"), 4).alias("avg_qty"),
            _fround(
                F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).cast(
                    "double"
                )
                / F.count("*"),
                4,
            ).alias("avg_price"),
            _fround(
                F.sum(F.col("l_discount").cast("decimal(30,8)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top 10 unshipped-revenue orders for one segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = "1998-01-01"
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c["c_custkey"] == o["o_custkey"])
        .filter(F.col("o_orderdate") < cut)
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") > cut)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            _ts_str("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


def q_q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue per nation where supplier and customer
    share the nation, one region, one date year."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .filter(c["c_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def q_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of orders-per-customer including
    zero-order customers (left outer join + two-level aggregation)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("n_customers")
    )


def q_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue from small-quantity lineitems of one
    brand, threshold correlated on the per-part average quantity. The
    per-part aggregate is tiny relative to lineitem, so it broadcasts
    back — the correlated subquery costs one extra scan, zero extra
    shuffles on the fact side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(F.col("p_brand") == "Brand#4")
        .join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            _fround(
                F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


def q_q18_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds 300 (HAVING
    over a child rollup, semi-joined back to parent + customer)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            _ts_str("o_orderdate").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the low-cardinality (hence
    hot-keyed) event_type — result identical to the plain group-by."""
    from aproximacion_1_etl_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        salt_on="event_id",
        metrics={
            "n_events": F.lit(1),
            "sum_value": F.col("value"),
        },
        buckets=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        _fround(F.col("sum_value").cast("double"), 2).alias("sum_value"),
    )


def q_skew_replicated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicated-dim salted join events->customer, rolled up per
    mktsegment — result identical to the plain equi-join."""
    from aproximacion_1_etl_spark.operators.skew import replicated_skew_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = replicated_skew_join(
        ev, c, fact_key="user_id", dim_key="c_custkey", salt_on="event_id",
        buckets=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        _dsum(F.col("value")).alias("sum_value"),
    )


def q_grouped_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: grouped Arrow-batched Python (applyInPandas) — per-user
    exact median / spread of event values."""
    from aproximacion_1_etl_spark.operators.pandas_ops import (
        grouped_stats_pandas,
    )

    ev = load_table(spark, sf_dir, "events")
    return grouped_stats_pandas(ev, key="user_id", value_col="value")


def q_s3_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: day-partitioned parquet table sink + partition-pruned read
    (the engine's GCS-day-layout analog; the read scans only the
    selected year's directories — verified in tests via the plan's
    partition filters)."""
    o = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="graft_part_")
    o.withColumn("order_year", F.year("o_orderdate")).repartition(
        "order_year"
    ).write.mode("overwrite").partitionBy("order_year").parquet(path)
    back = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    out = back.groupBy(
        F.month("o_orderdate").cast("bigint").alias("order_month")
    ).agg(
        F.count("*").alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("month_total"),
    )
    return _reclaimed(out, path)


def q_streaming_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: custom stateful operator (applyInPandasWithState) — running
    per-user sessionization; AvailableNow replay makes it equal the
    batch result, which the oracle checks."""
    from aproximacion_1_etl_spark.streaming.stateful import (
        run_stateful_sessions,
    )

    return run_stateful_sessions(spark, sf_dir, glob="events.parquet")


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2: per-user event stream -> validity intervals (lead window),
    current row open-ended."""
    from aproximacion_1_etl_spark.operators.refine import scd2_history

    ev = load_table(spark, sf_dir, "events")
    out = scd2_history(
        ev,
        keys=["user_id"],
        ts_col="ts",
        tiebreak="event_id",
        attrs=["event_type"],
    )
    return out.select(
        "user_id",
        "event_type",
        _ts_str("valid_from").alias("valid_from"),
        _ts_str("valid_to").alias("valid_to"),
        "is_current",
    )


def q_bucketed_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: orders and per-order lineitem
    both bucketed on the order key, joined exchange-free (the plan has
    no shuffle; asserted in tests), then rolled up per status."""
    import os

    from aproximacion_1_etl_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    write_bucketed(o, f"b_orders_{tag}", "o_orderkey", n_buckets=8)
    write_bucketed(li, f"b_lineitem_{tag}", "o_orderkey", n_buckets=8)
    joined = bucketed_join(
        spark, f"b_orders_{tag}", f"b_lineitem_{tag}", on="o_orderkey"
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per event_type — the
    built-in JVM `percentile` aggregate; for 100 TB dashboards swap in
    `approx_percentile` (t-digest, single-pass mergeable sketch)."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return ev.groupBy("event_type").agg(
        _fround(q[0], 4).alias("p50"),
        _fround(q[1], 4).alias("p90"),
        _fround(q[2], 4).alias("p99"),
    )


def q_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency: explode lowercase tokens, count per (lang,
    token), keep the top 5 per language (rank window with count-desc /
    token-asc tiebreak). The canonical corpus-stats shape: map-side
    explode -> one partial-agged shuffle -> small per-group window."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias(
            "token"
        ),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "token", "n", F.col("rank").cast("bigint").alias("rank"))
    )


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 UDTF surface: a Python user-defined TABLE function (Spark
    3.5+/4.x) splitting each document into numbered sentences via a
    LATERAL join — the FlatMap-with-multiple-outputs shape of the
    reference's Beam generators (`src/2_...py:73-110`) as a first-class
    SQL table function."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx BIGINT, sentence STRING")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                if s:
                    yield i + 1, s

    spark.udtf.register("split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "docs_for_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM docs_for_udtf d, LATERAL split_sentences(d.text) s
        """
    )


def q_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance customers with no recent
    orders — scalar aggregate subquery (broadcast single row) + anti
    join against a filtered fact."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1998-06-01"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_custs"),
        _dsum(F.col("c_acctbal")).alias("total_bal"),
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


def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 stream-stream interval join: click-like events joined to the
    same user's purchase-like events within the following 24 h, both
    sides watermarked (state bounded by watermark + interval). The
    matched pair set is deterministic, so it oracle-checks against the
    batch interval join."""
    import uuid

    from aproximacion_1_etl_spark.streaming.events import read_events_stream

    table = f"stream_ij_{uuid.uuid4().hex[:8]}"
    s1 = (
        read_events_stream(spark, sf_dir, "events.parquet")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    s2 = (
        read_events_stream(spark, sf_dir, "events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = s1.join(
        s2,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts") + F.expr("INTERVAL 24 HOURS")
        ),
    ).select("click_id", "purchase_id", "user_id")
    import shutil

    ckpt = tempfile.mkdtemp(prefix="ckpt_ij_")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return spark.table(table)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_streaming_interval_join_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.9 stream-stream LEFT OUTER interval join with watermark
    state cleanup — the shape the inner join can't express: clicks
    that never converted within 6 h still emit (purchase_id NULL),
    but only once the watermark passes the end of their join window
    (that's the state-eviction moment — unbounded retention would
    otherwise be required to prove a non-match). Clicks whose window
    is still open when the stream ends are correctly withheld: the
    oracle mirrors the exact flush rule, matched pairs plus unmatched
    clicks with click_ts + 6h < final watermark, where the final
    watermark is min(max click_ts, max purchase_ts) - 1h — the
    cross-stream minimum Spark maintains. State stays bounded by
    watermark + interval at any stream length."""
    import shutil
    import uuid

    from aproximacion_1_etl_spark.streaming.events import read_events_stream

    table = f"stream_oj_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_oj_")
    s1 = (
        read_events_stream(spark, sf_dir, "events.parquet")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    s2 = (
        read_events_stream(spark, sf_dir, "events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = s1.join(
        s2,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts") + F.expr("INTERVAL 6 HOURS")
        ),
        "left_outer",
    ).select("click_id", "purchase_id", "user_id")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return spark.table(table)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling (polynomial) hash fingerprint per document: fold
    acc = (acc*31 + codepoint) mod 1e9+7 over every character — exact
    BIGINT arithmetic JVM-side via a higher-order aggregate (no UDF),
    order-sensitive unlike the bag-of-tokens fingerprint in
    text_profile."""
    docs = load_table(spark, sf_dir, "documents")
    chars = F.regexp_extract_all(F.col("text"), F.lit(r"[\s\S]"), 0)
    rolled = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31).cast("long") + F.ascii(ch))
        % F.lit(1000000007).cast("long"),
    )
    return docs.select(
        "doc_id",
        rolled.alias("rolling_hash"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point: temp-view catalog + spark.sql —
    the same Catalyst plans as the DataFrame API (a CTE + window query
    exercising the SQL parser path end-to-end)."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH yearly AS (
          SELECT o_custkey,
                 year(o_orderdate) AS yr,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 floor(sum(CAST(o_totalprice AS DECIMAL(30,8)))
                       * 100.0 + 0.5) / 100.0 AS spend
          FROM orders GROUP BY 1, 2
        )
        SELECT o_custkey, yr, n_orders,
               CAST(spend AS DOUBLE) AS spend,
               CAST(rank() OVER (PARTITION BY yr ORDER BY spend DESC,
                                 o_custkey ASC) AS BIGINT) AS spend_rank
        FROM yearly
        WHERE yr = 1997
        ORDER BY spend_rank LIMIT 25
        """
    )


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink: header + explicit DDL schema + date format on
    write, permissive typed read back (the engine's delimited-file
    surface; reference only had JSON, §2.1)."""
    o = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="graft_csv_")
    o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    ).repartition(4).write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(
            "o_orderkey BIGINT, o_orderstatus STRING, "
            "totalprice DOUBLE, orderdate STRING"
        )
        .option("header", True)
        .csv(path)
    )
    out = back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        _dsum(F.col("totalprice")).alias("total"),
        F.min("orderdate").alias("first_date"),
    )
    return _reclaimed(out, path)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink: the second columnar at-rest format (built into
    Spark; same pushdown/pruning machinery as parquet)."""
    li = load_table(spark, sf_dir, "lineitem")
    path = tempfile.mkdtemp(prefix="graft_orc_")
    li.select("l_orderkey", "l_quantity", "l_returnflag").write.mode(
        "overwrite"
    ).orc(path)
    back = spark.read.orc(path).filter(F.col("l_returnflag") == "R")
    out = back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )
    return _reclaimed(out, path)


def q_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout roundtrip (layout.zorder_write): lineitem
    clustered on the interleaved-bit curve of (l_orderkey, l_partkey),
    then scanned with a selective 2-D box predicate. The oracle filters
    the raw table — equality proves the rewrite is content-preserving
    and the predicate semantics survive the layout. The PRUNING payoff
    (most row groups skipped on either dimension) is measured by
    tests/test_scale_ops.py::test_zorder_layout_skips_on_both_dimensions;
    at 100 TB this layout is what makes a 2-D point query touch MBs,
    not the whole table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    from aproximacion_1_etl_spark.sources.layout import zorder_write

    path = tempfile.mkdtemp(prefix="graft_zord_")
    zorder_write(li, path, ["l_orderkey", "l_partkey"], n_files=16)
    back = spark.read.parquet(path).filter(
        (F.col("l_orderkey") <= 3000) & (F.col("l_partkey") <= 500)
    )
    out = back.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        _fround(F.col("l_quantity").cast("double"), 2).alias(
            "l_quantity"
        ),
    )
    return _reclaimed(out, path)


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 higher-order array functions: per-order sorted quantity
    array (deterministic collect), filtered/transformed/folded JVM-side
    — no UDFs, no explode-regroup round trip."""
    li = load_table(spark, sf_dir, "lineitem")
    arr = F.array_sort(F.collect_list(F.round("l_quantity", 2)))
    return (
        li.groupBy("l_orderkey")
        .agg(arr.alias("qtys"))
        .select(
            "l_orderkey",
            F.size("qtys").cast("bigint").alias("n_items"),
            F.element_at("qtys", 1).alias("min_qty"),
            F.size(F.filter("qtys", lambda q: q > 25))
            .cast("bigint")
            .alias("n_large"),
            _fround(
                F.aggregate(
                    F.transform("qtys", lambda q: q * F.lit(2.0)),
                    F.lit(0.0),
                    lambda acc, q: acc + q,
                ),
                2,
            ).alias("double_total"),
        )
    )


def q_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar pandas_udf (Arrow-vectorized, batch-at-a-time): L2
    norm of each embedding; see operators/pandas_ops.l2_norm_udf."""
    from aproximacion_1_etl_spark.operators.pandas_ops import l2_norm_udf

    l2_norm = l2_norm_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("n_dims"),
        l2_norm(F.col("embedding").cast("array<double>")).alias("l2_norm"),
    )


def q_streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: streaming dropDuplicates — the distinct (user_id,
    event_type) key set surviving a streamed dedup equals the batch
    DISTINCT (survivor choice varies with arrival order, key set does
    not, so only keys are emitted)."""
    import uuid

    from aproximacion_1_etl_spark.streaming.events import read_events_stream

    table = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    stream = (
        read_events_stream(spark, sf_dir, "events.parquet")
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    import shutil

    ckpt = tempfile.mkdtemp(prefix="ckpt_dd_")
    q = (
        stream.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # memory sink holds rows driver-side; the checkpoint is dead
        # once the AvailableNow run terminates
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(table)


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


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) with a value-checked error contract:
    estimates themselves are engine-specific (DuckDB's HLL differs), so
    the hashed output carries the EXACT distinct count plus a boolean
    asserting the estimate landed within 3x the configured rsd (default
    0.05 -> 15% bound; measured 6.7% at sf0.1). The oracle emits the
    same exact counts and TRUE — a failed bound fails the driver gate,
    not just a pytest."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("est"),
        F.countDistinct("user_id").alias("n_exact"),
    ).select(
        "event_type",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.lit(0.15) * F.col("n_exact")
        ).alias("est_ok"),
    )


# ----------------------------------------------------------- north star


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: exact dedup — one survivor per normalized-content sha256 hash."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: MinHash+LSH near-dup candidate pairs (shingle -> banded minhash -> bucket self-join)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, n=3, distinct=False)
    sigs = minhash_signatures(sh, bands=8)
    return minhash_candidate_pairs(sigs, bands=8, min_matching_bands=2)


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 extension: reproducible 5% key-hash sample (no shuffle in
    the sample itself — narrow filter on an md5 prefix) rolled up per
    lang. Stable across runs/engines/partitionings, unlike df.sample."""
    from aproximacion_1_etl_spark.functions.sampling import (
        deterministic_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.05).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_sampled"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 extension: leak-proof 80/10/10 train/val/test split by key
    hash — the same doc lands in the same split every run."""
    from aproximacion_1_etl_spark.functions.sampling import split_column

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "*",
        split_column(
            F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
        ),
    )
    return labeled.groupBy("split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 extension: per-stratum deterministic sampling (sampleBy
    equivalent): downsample dominant 'en' to 20%, keep 50% of 'es';
    other langs dropped. Narrow filter; no shuffle until the rollup."""
    from aproximacion_1_etl_spark.functions.sampling import (
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(
            docs, "doc_id", "lang", {"en": 0.2, "es": 0.5}
        )
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_sampled"))
    )


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 flagship composite: the end-to-end training-corpus
    pipeline — quality-score every doc, gate at 0.5, keep one survivor
    (min id) per normalized-content hash, assign a leak-proof 80/10/10
    split by key hash, roll up per (split, lang).

    Scale shape: one narrow scoring pass, one shuffle on the 256-bit
    content hash (uniform), one final rollup — no driver-side state."""
    from aproximacion_1_etl_spark.functions.sampling import split_column
    from aproximacion_1_etl_spark.text.analysis import quality_score
    from aproximacion_1_etl_spark.text.dedup import normalized

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        quality_score(F.col("text")).alias("quality"),
        F.sha2(normalized(F.col("text")), 256).alias("content_hash"),
    )
    good = scored.filter(F.col("quality") >= 0.5)
    w = Window.partitionBy("content_hash")
    survivors = good.withColumn(
        "keep_id", F.min("doc_id").over(w)
    ).filter(F.col("doc_id") == F.col("keep_id"))
    labeled = survivors.select(
        "lang",
        "quality",
        split_column(
            F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
        ),
    )
    return labeled.groupBy("split", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        _dsum(F.col("quality"), 4).alias("sum_quality"),
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: SimHash 16-bit signatures per doc (near-dups differ in few bits)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, bits=16)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: exact 3-gram Jaccard similarity for docs sharing a shingle (LSH verification stage)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, n=3)
    return ngram_jaccard_pairs(sh, threshold=0.3)


def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 asymmetric CONTAINMENT detection (doc-in-doc — quoted
    posts, mirrors with boilerplate): |inner ∩ outer| / |inner| >= 0.9
    over 3-gram shingle sets (text/dedup.py::containment_pairs). The
    directional ratio catches what Jaccard dilutes away when sizes
    differ; the intersection is computed ONCE per unordered pair and
    both directions derive map-side."""
    from aproximacion_1_etl_spark.text.dedup import (
        containment_pairs,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, n=3)
    return containment_pairs(sh, threshold=0.9)


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: per-doc text analytics — token counts, BPE-ish tokens, language-ID, quality score, fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).cast("bigint").alias("n_tokens"),
        regex_token_count(t).cast("bigint").alias("n_bpe_tokens"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: exact brute-force cosine top-k per query vector (broadcast queries, JVM array folds)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_bruteforce(emb, query_ids=[0, 1, 2, 3, 4], k=10)


_IVF_CODEBOOK_CACHE: dict[tuple, dict[int, list[float]]] = {}


def _trained_codebook(
    spark: SparkSession, sf_dir: str
) -> dict[int, list[float]]:
    """Train-once-per-corpus IVF codebook (memoized on (sf_dir, parquet
    mtime) so a regenerated corpus retrains): the codebook is a model
    artifact — in production it is trained once and shipped to every
    consumer, so the ann and semantic-dedup catalog keys sharing one
    training run is the honest cost model, not a bench trick.
    Deterministic, so the cache never changes a result."""
    key = _artifact_key(sf_dir, "embeddings")
    cb = _IVF_CODEBOOK_CACHE.get(key)
    if cb is None:
        from aproximacion_1_etl_spark.text.vector import (
            derive_n_centroids,
            train_ivf_centroids,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cb = train_ivf_centroids(
            emb, n_centroids=derive_n_centroids(emb.count()), iterations=3
        )
        _IVF_CODEBOOK_CACHE[key] = cb
    return cb


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: IVF approximate top-k over a TRAINED codebook — k-means
    centroids (corpus-size-derived count, so cells stay balanced as the
    corpus grows) baked as plan literals for map-side cell assignment,
    nprobe cells probed. The oracle unrolls the identical training
    recurrence, so the key stays fully value-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_ivf(
        emb,
        query_ids=[0, 1, 2, 3, 4],
        k=10,
        nprobe=4,
        centroids=_trained_codebook(spark, sf_dir),
    )


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: LSH-bucketed approximate top-k (random-hyperplane signs, multi-table probing)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_lsh(
        emb, query_ids=[0, 1, 2, 3, 4], k=10, planes=4, tables=2, dim=64
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: embedding near-dup pairs, high-recall verified form — exact cosine over union-of-4-table LSH candidates (no all-pairs join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup(emb, threshold=0.4, tables=4)


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: embedding near-dup pairs, LSH-bucketed — exact cosine only within shared buckets."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_lsh(emb, threshold=0.4)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: multimodal feature extraction over binary payloads (mapInPandas, stubbed decode)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_stub_features(attach_media(docs))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 multimodal: 1->N frame-sampling fan-out over video
    payloads (mapInPandas; frames surfaced as md5 so the binary column
    is hash-comparable across engines)."""
    from aproximacion_1_etl_spark.text.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents")
    frames = frame_sample(attach_media(docs), every_nth=10)
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        F.md5("frame").alias("frame_md5"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 multimodal, REAL decode path: deterministic PPM/BMP image
    corpus keyed off doc_id (text/multimodal.py::make_synthetic_images)
    is parsed back by the pure-Python decoder (real_decode: header,
    BMP 4-byte stride + bottom-up flip + BGR->RGB) and per-channel
    pixel sums come back as exact integers; means are computed
    engine-side so the oracle can verify the decoded statistics
    analytically — a parse bug anywhere is a value mismatch."""
    from aproximacion_1_etl_spark.text.multimodal import (
        decode_image_features,
        make_synthetic_images,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_image_features(make_synthetic_images(docs))
    return feats.select(
        "doc_id",
        "fmt",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("n_px").cast("bigint").alias("n_px"),
        _fround(F.col("sum_r") / F.col("n_px"), 4).alias("mean_r"),
        _fround(F.col("sum_g") / F.col("n_px"), 4).alias("mean_g"),
        _fround(F.col("sum_b") / F.col("n_px"), 4).alias("mean_b"),
    )


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 multimodal, REAL audio decode path (the codec-free
    extension next to multimodal_decode's PPM/BMP): deterministic mono
    16-bit PCM WAV clips keyed off doc_id
    (text/multimodal.py::make_synthetic_audio — every 4th clip carries
    a LIST metadata chunk, so RIFF chunk-WALKING is on the oracle
    path) are parsed back by the pure-Python RIFF/PCM decoder and
    per-clip duration / RMS / zero-crossing / clipping-fraction come
    back from exact integer statistics; the ratios are computed
    engine-side so the analytic oracle value-checks the decode —
    any header, chunk-size, padding, or sample-sign bug is a value
    mismatch. Compressed WAV (format code != 1) raises — the same
    explicit codec boundary as JPEG/PNG."""
    from aproximacion_1_etl_spark.text.multimodal import (
        decode_audio_features,
        make_synthetic_audio,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_audio_features(make_synthetic_audio(docs))
    return feats.select(
        "doc_id",
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
        _fround(
            F.col("n_frames") * F.lit(1000.0) / F.col("sample_rate"), 4
        ).alias("duration_ms"),
        _fround(
            F.sqrt(F.col("sum_sq").cast("double") / F.col("n_frames")), 4
        ).alias("rms"),
        F.col("n_zero_cross").cast("bigint").alias("n_zero_cross"),
        _fround(
            F.col("n_clipped").cast("double") / F.col("n_frames"), 4
        ).alias("clip_frac"),
    )


def q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: Structured Streaming tumbling-window agg, Trigger.AvailableNow
    (deterministic => oracle-checkable against the batch equivalent)."""
    return run_available_now(spark, sf_dir, "1 day", glob="events.parquet")


def q_streaming_session_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.9 native session windows in Structured Streaming: per-user
    gap-based sessions (2 h) via F.session_window — the engine merges
    and extends session state incrementally, bounded by the watermark
    (contrast q_sessionize, the batch lag+cumsum form of the same
    semantics). Append mode emits a session only when the watermark
    passes its end (last event + gap) — the state-eviction moment;
    sessions still open at stream end are withheld. The oracle
    replays gap sessionization relationally and applies the exact
    flush rule (session_end + gap < max ts - 1 h), with the gap
    boundary end-EXCLUSIVE (an event exactly gap seconds after the
    last starts a new session), matching session_window's [start,
    end) semantics."""
    import shutil
    import uuid

    from aproximacion_1_etl_spark.streaming.events import read_events_stream

    table = f"stream_sw_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_sw_")
    s = (
        read_events_stream(spark, sf_dir, "events.parquet")
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "2 hours"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(
                "session_window.start", "yyyy-MM-dd HH:mm:ss"
            ).alias("session_start"),
            F.date_format(
                "session_window.end", "yyyy-MM-dd HH:mm:ss"
            ).alias("session_end"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )
    try:
        q = (
            s.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return spark.table(table)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: hopping/sliding windows (2-day window, 1-day slide) over the
    same AvailableNow stream — each event lands in 2 windows."""
    return run_available_now(
        spark, sf_dir, "2 days", glob="events.parquet", slide="1 day"
    )


# ------------------------------------------------- round-2 TPC-H widening
# The testdata star schema lacks partsupp and the shipmode/commitdate/
# receiptdate lineitem columns, so Q12/Q16/Q20 are adapted to the
# available columns (the join/agg SHAPE — the thing being tested — is
# preserved; the predicate columns differ and are documented per query).


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-aggregate — the canonical
    predicate-pushdown probe. All three filters reach the parquet scan
    (PushedFilters in .explain), no join, no shuffle beyond the final
    single-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between two nations, both
    directions, by ship year. Two aliased broadcast joins of the same
    nation dim (supplier side vs customer side)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("sn_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == pair[0][0]) & (F.col("cust_nation") == pair[0][1]))
            | ((F.col("supp_nation") == pair[1][0]) & (F.col("cust_nation") == pair[1][1]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume")
        )
    )


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue lost to returns
    (l_returnflag = 'R') in one quarter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


def q_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style (adapted: l_linestatus stands in for the absent
    l_shipmode): per line status, count of high- vs low-priority orders
    shipped in one year — conditional aggregation via CASE inside
    sum."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promo revenue share for one ship month —
    ratio of two conditional decimal sums, broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,8)"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-03-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            _fround(
                (
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", disc).otherwise(
                            F.lit(0).cast("decimal(30,8)")
                        )
                    ).cast("double")
                    / F.sum(disc).cast("double")
                ),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style (adapted: supplier-per-part relationships come
    from lineitem, since the testdata has no partsupp; the 'customer
    complaints' exclusion becomes negative-balance suppliers): distinct
    supplier count per (brand, type, size) bucket with an anti-join
    exclusion list."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad),
            li["l_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(
            (F.col("p_brand") != "Brand#4")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue under three OR'd brand/size/quantity
    predicate groups — exercises disjunctive filter pushdown through a
    broadcast join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    g1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    g2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    g3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 50))
        & (F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(g1 | g2 | g3)
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def q_q20_promo_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style (adapted to lineitem as the part-supplier
    bridge): suppliers who shipped more than 300 units of PROMO parts
    in one year — HAVING rollup semi-joined back to the supplier dim."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    promo_qty = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(
            F.broadcast(p.filter(F.col("p_type") == "PROMO")),
            li["l_partkey"] == p["p_partkey"],
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("promo_qty"))
        .filter(F.col("promo_qty") > 300)
    )
    return (
        s.join(
            F.broadcast(promo_qty),
            s["s_suppkey"] == promo_qty["l_suppkey"],
            "left_semi",
        )
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


# --------------------------------------------- round-2 scale operators


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (merge_partial_rollup): the
    historical per-part rollup plus a delta batch's partials, merged
    without rescanning history — equivalent by construction to the full
    recompute the oracle runs."""
    from aproximacion_1_etl_spark.operators.refine import (
        merge_partial_rollup,
    )

    li = load_table(spark, sf_dir, "lineitem")
    cut = "1999-01-01"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_partkey").agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(30,8)")).alias(
                "sum_qty"
            ),
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(30,8)")
            ).alias("revenue"),
        )

    base = partial(li.filter(F.col("l_shipdate") < cut))
    delta = partial(li.filter(F.col("l_shipdate") >= cut))
    merged = merge_partial_rollup(
        base, delta, ["l_partkey"], ["n_items", "sum_qty", "revenue"]
    )
    return merged.select(
        "l_partkey",
        F.col("n_items").cast("bigint").alias("n_items"),
        _fround(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
        _fround(F.col("revenue").cast("double"), 2).alias("revenue"),
    )


def _orders_cdc(
    o: DataFrame, cut: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The shared orders CDC fixture for the IVM keys (ivm_join,
    ivm_join_rollup, streaming_ivm_join — their oracle SQL encodes the
    same scheme): facts dated >= ``cut`` are INSERTS, pre-cut facts
    with orderkey %89 (and not %97) are price-bump UPDATES, pre-cut
    %97 facts are DELETES. One definition so query and oracle cannot
    drift independently per key. Returns (inserts, updates, deletes),
    each carrying op='U'/'D'."""
    old_facts = o.filter(F.col("o_orderdate") < cut)
    inserts = o.filter(F.col("o_orderdate") >= cut).withColumn(
        "op", F.lit("U")
    )
    updates = (
        old_facts.filter(
            (F.col("o_orderkey") % 89 == 0)
            & (F.col("o_orderkey") % 97 != 0)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumn("op", F.lit("U"))
    )
    deletes = old_facts.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "op", F.lit("D")
    )
    return inserts, updates, deletes


def q_incremental_rollup_retract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Aggregate IVM under DELETES (Z-set retractions): the per-part
    rollup over ALL lineitems, minus the returned ('R') facts entered
    as negated partials — merged without rescanning the kept facts.
    The oracle recomputes over the surviving facts only; equality
    (including the disappearance of any fully-retracted key) proves
    the retraction algebra in merge_partial_rollup(count_col=...)."""
    from aproximacion_1_etl_spark.operators.refine import (
        merge_partial_rollup,
    )

    li = load_table(spark, sf_dir, "lineitem")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_partkey").agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(30,8)")).alias(
                "sum_qty"
            ),
        )

    base = partial(li)
    retraction = partial(li.filter(F.col("l_returnflag") == "R")).select(
        "l_partkey",
        (-F.col("n_items")).alias("n_items"),
        (-F.col("sum_qty")).alias("sum_qty"),
    )
    merged = merge_partial_rollup(
        base,
        retraction,
        ["l_partkey"],
        ["n_items", "sum_qty"],
        count_col="n_items",
    )
    return merged.select(
        "l_partkey",
        F.col("n_items").cast("bigint").alias("n_items"),
        _fround(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
    )


def q_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance (maintain_join_view): a
    materialized orders-x-customer view is folded forward under fact
    CDC (inserts past the cutoff, price updates on %89 keys, deletes
    on %97 keys) and dim CDC (%10 customers start STALE and are
    corrected; %100==7 customers are DELETED — their view rows drop
    under inner-join semantics) — without re-joining history. The
    oracle recomputes the final view from scratch; equality proves all
    four delta rules (fact anti-drop, dim-delete anti-drop, dim
    propagation, refresh re-join).

    Scale: the view side moves through broadcast joins and a union
    only — zero shuffles of history (see
    operators/refine.py::maintain_join_view)."""
    from aproximacion_1_etl_spark.operators.refine import (
        maintain_join_view,
    )

    cut = "1998-06-01"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    changed_dim = F.col("c_custkey") % 10 == 0
    deleted_dim = F.col("c_custkey") % 100 == 7
    dim_old = c.withColumn(
        "c_mktsegment",
        F.when(changed_dim, F.lit("STALE")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    dim_changes = (
        c.filter(changed_dim & ~deleted_dim)
        .withColumn("dop", F.lit("U"))
        .unionByName(c.filter(deleted_dim).withColumn("dop", F.lit("D")))
    )
    dim_current = c.filter(~deleted_dim)

    old_facts = o.filter(F.col("o_orderdate") < cut)
    view = old_facts.join(
        dim_old.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )

    inserts, updates, deletes = _orders_cdc(o, cut)
    fact_changes = inserts.unionByName(updates).unionByName(deletes)

    out = maintain_join_view(
        view,
        fact_changes,
        dim_current.withColumnRenamed("c_custkey", "o_custkey"),
        dim_changes.withColumnRenamed("c_custkey", "o_custkey"),
        fact_key="o_orderkey",
        join_key="o_custkey",
        dim_op_col="dop",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        _fround(F.col("o_totalprice").cast("double"), 2).alias(
            "o_totalprice"
        ),
        "c_name",
        "c_mktsegment",
        _fround(F.col("c_acctbal").cast("double"), 2).alias("c_acctbal"),
    )


def q_ivm_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view IVM under OUT-OF-ORDER CDC (maintain_join_view_full):
    the initial dim is missing two customer cohorts (%100==3 "late",
    %100==13 "never"), so their orders start as ORPHANS instead of
    view rows. One maintenance batch delivers the late cohort's dim
    rows plus the standard fact CDC; the late cohort's facts PROMOTE
    into the view, the never cohort's stay orphaned (excluded from the
    view the oracle recomputes). Proves early-arriving facts are not
    lost — the failure mode of plain inner-join maintenance."""
    from aproximacion_1_etl_spark.operators.refine import (
        maintain_join_view_full,
    )

    cut = "1998-06-01"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    late = F.col("o_custkey") % 100 == 3
    never = F.col("o_custkey") % 100 == 13
    dim_old = c.filter(~late & ~never)
    dim_current = c.filter(~never)
    dim_changes = c.filter(late).withColumn("dop", F.lit("U"))

    old_facts = o.filter(F.col("o_orderdate") < cut)
    view = old_facts.join(dim_old, "o_custkey")
    orphans = old_facts.join(
        dim_old.select("o_custkey"), "o_custkey", "left_anti"
    )

    inserts, updates, deletes = _orders_cdc(o, cut)
    fact_changes = inserts.unionByName(updates).unionByName(deletes)

    view_out, _orphans_out = maintain_join_view_full(
        view,
        orphans,
        fact_changes,
        dim_current,
        dim_changes,
        fact_key="o_orderkey",
        join_key="o_custkey",
        dim_op_col="dop",
    )
    return view_out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        _fround(F.col("o_totalprice").cast("double"), 2).alias(
            "o_totalprice"
        ),
        "c_name",
        "c_mktsegment",
        _fround(F.col("c_acctbal").cast("double"), 2).alias("c_acctbal"),
    )


def q_cdf_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change-capture -> incremental-apply LOOP closed: two
    committed versions of a facts snapshot (pre/post the standard CDC
    scheme) are DIFFED into a change feed (snapshot_change_feed — 'D'
    old images, 'U' after-images, |changes|-sized), and that derived
    feed drives maintain_join_view against the customer dim. The
    maintained view must equal the new version joined from scratch —
    proving a consumer needs no producer-side CDC instrumentation:
    the version-pair diff IS the feed (the Delta CDF surface,
    derived)."""
    import shutil

    from aproximacion_1_etl_spark.operators.refine import (
        maintain_join_view,
    )
    from aproximacion_1_etl_spark.sources.versioned import (
        snapshot_change_feed,
        write_snapshot,
    )

    cut = "1998-06-01"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    old_facts = o.filter(F.col("o_orderdate") < cut)
    inserts, updates, deletes = _orders_cdc(o, cut)
    changed_keys = updates.select("o_orderkey").unionByName(
        deletes.select("o_orderkey")
    )
    final_facts = (
        old_facts.join(changed_keys, "o_orderkey", "left_anti")
        .unionByName(updates.drop("op"))
        .unionByName(inserts.drop("op"))
    )

    base = tempfile.mkdtemp(prefix="graft_cdf_")
    path = os.path.join(base, "facts")
    try:
        v0 = write_snapshot(old_facts, path)
        v1 = write_snapshot(final_facts, path)
        feed = snapshot_change_feed(
            spark, path, v0, v1, ["o_orderkey"]
        )
        view = old_facts.join(dim, "o_custkey")
        no_dim_changes = spark.createDataFrame(
            [],
            "o_custkey BIGINT, c_name STRING, c_mktsegment STRING, "
            "c_acctbal DOUBLE",
        )
        out = maintain_join_view(
            view,
            feed,
            dim,
            no_dim_changes,
            fact_key="o_orderkey",
            join_key="o_custkey",
        ).select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            _fround(F.col("o_totalprice").cast("double"), 2).alias(
                "o_totalprice"
            ),
            "c_name",
            "c_mktsegment",
            _fround(F.col("c_acctbal").cast("double"), 2).alias(
                "c_acctbal"
            ),
        )
        return _reclaimed_dist(out, base)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)


def q_ivm_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-join IVM — the two incremental primitives
    COMPOSED: a per-segment revenue rollup over orders-x-customer is
    maintained under the same fact CDC as ``ivm_join`` by (1) reading
    the changed keys' BEFORE-IMAGES out of the denormalized join view
    (broadcast inner join — map-side, no shuffle of the view) and
    retracting them as negated partials, (2) adding the refreshed
    facts' partials from a |delta|-sized re-join, (3) folding both
    into the stored rollup with merge_partial_rollup(count_col=...).
    No history re-aggregation anywhere; decimal partials keep the
    retract/add algebra exact. A CDC feed that carries before-images
    (the usual Debezium shape) makes even the view read unnecessary.
    The oracle recomputes the rollup over the final fact set from
    scratch."""
    from aproximacion_1_etl_spark.operators.refine import (
        merge_partial_rollup,
    )

    cut = "1998-06-01"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    old_facts = o.filter(F.col("o_orderdate") < cut)
    view = old_facts.join(dim, "o_custkey")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("c_mktsegment").agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)")).alias(
                "revenue"
            ),
        )

    base = partial(view)

    inserts, updates, deletes = _orders_cdc(o, cut)
    fact_changes = inserts.unionByName(updates).unionByName(deletes)

    # before-images exist only for UPDATES and DELETES — inserts by
    # construction have no view row, and including their keys would
    # size the broadcast by CDC insert volume for zero matches
    touched = updates.select("o_orderkey").unionByName(
        deletes.select("o_orderkey")
    )
    before_images = view.join(F.broadcast(touched), "o_orderkey")
    retraction = partial(before_images).select(
        "c_mktsegment",
        (-F.col("n_orders")).alias("n_orders"),
        (-F.col("revenue")).alias("revenue"),
    )
    refreshed = (
        fact_changes.filter(F.col("op") == "U")
        .drop("op")
        .join(dim, "o_custkey")
    )
    delta = retraction.unionByName(partial(refreshed))
    merged = merge_partial_rollup(
        base,
        delta,
        ["c_mktsegment"],
        ["n_orders", "revenue"],
        count_col="n_orders",
    )
    return merged.select(
        "c_mktsegment",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        _fround(F.col("revenue").cast("double"), 2).alias("revenue"),
    )


def q_m2_merge_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 + schema evolution (merge_upsert_evolve): the update batch
    carries a column the master never had (is_priority); the merged
    output widens, with NULL for keys only present in the master."""
    from aproximacion_1_etl_spark.operators.refine import (
        merge_upsert_evolve,
    )

    o = load_table(spark, sf_dir, "orders")
    master = o.filter(F.col("o_orderdate") < "1999-01-01").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.filter(F.col("o_orderdate") >= "1998-01-01").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .alias("is_priority"),
    )
    merged = merge_upsert_evolve(master, updates, ["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "is_priority",
    )


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler over orders: nulls + exact distinct
    per column in one aggregation job."""
    from aproximacion_1_etl_spark.functions.profile import column_profile

    o = load_table(spark, sf_dir, "orders")
    return column_profile(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 TF-IDF terms over the documents corpus."""
    from aproximacion_1_etl_spark.text.analysis import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top_k=5)


def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 quality: intra-doc duplicate 3-gram ratio (Gopher-style
    repetition filter signal) per document."""
    from aproximacion_1_etl_spark.text.dedup import repetition_profile

    docs = load_table(spark, sf_dir, "documents")
    return repetition_profile(docs, n=3)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: benchmark decontamination — corpus docs sharing >= 3
    distinct 5-grams with the held-out 'benchmark' slice (source =
    src0), benchmark side broadcast."""
    from aproximacion_1_etl_spark.text.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    benchmark = docs.filter(F.col("source") == "src0")
    return decontaminate(corpus, benchmark, n=5, min_shared=3)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: PII scrub pass over documents — redacted text digest +
    match count per doc (counts are 0 on this synthetic corpus; the
    redaction semantics are unit-tested on crafted rows in
    test_cleaning)."""
    from aproximacion_1_etl_spark.functions.cleaning import (
        pii_count,
        pii_scrub,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(pii_scrub(F.col("text"))).alias("scrubbed_md5"),
        pii_count(F.col("text")).alias("n_pii"),
    )


def q_m2_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 + CDC deletes (merge_upsert_delete): change batch carries
    op U/D; D drops the order from the merged master."""
    from aproximacion_1_etl_spark.operators.refine import (
        merge_upsert_delete,
    )

    o = load_table(spark, sf_dir, "orders")
    master = o.filter(F.col("o_orderdate") < "1999-01-01").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    changes = o.filter(F.col("o_orderdate") >= "1998-01-01").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "F", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    merged = merge_upsert_delete(master, changes, ["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def q_binary_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 multimodal ingest: docs materialized as .bin files, read
    back via the binaryFile source, manifest (id, bytes, md5)."""
    from aproximacion_1_etl_spark.sources.binary import (
        binary_ingest_manifest,
        read_binary_files,
        write_doc_files,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    out_dir = tempfile.mkdtemp(prefix="binsrc_")
    write_doc_files(docs, out_dir)
    return _reclaimed(
        binary_ingest_manifest(read_binary_files(spark, out_dir)), out_dir
    )


def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: stream-static broadcast enrichment (events stream x
    customer dim) rolled up per market segment."""
    from aproximacion_1_etl_spark.streaming.events import (
        stream_static_enrich,
    )

    customer = load_table(spark, sf_dir, "customer")
    return stream_static_enrich(
        spark, sf_dir, customer, glob="events.parquet"
    )


def q_q4_late_ship_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style (adapted: the testdata lacks commit/receipt
    dates, so 'late' = some lineitem shipped > 60 days after the order
    date): per order priority, count of orders in one quarter with at
    least one late shipment — EXISTS via left-semi join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        o.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == o["o_orderkey"]
    ).filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
    return (
        o.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        .join(
            late.select(F.col("l_orderkey").alias("lk")).distinct(),
            F.col("o_orderkey") == F.col("lk"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: NATION_1 suppliers' share of ASIA-customer
    revenue by order year — two nation lookups (supplier side for the
    share numerator, customer side joined through region for the
    market), conditional-sum ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,8)"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            _fround(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
                        F.lit(0).cast("decimal(30,8)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: supplier(s) achieving the maximum quarterly
    revenue — aggregate, then keep the rows equal to the global max
    (scalar-subquery shape via cross-joined max)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["mx"])
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style (adapted to available columns: 'R' return flag
    stands in for late delivery): suppliers of NATION_1 who returned
    lines on multi-supplier orders where NO OTHER supplier returned —
    the Q21 semi-join + anti-join sandwich on a self-referencing
    child."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    # EXISTS: another supplier on the same order (any flag)
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    ).distinct()
    # NOT EXISTS: another supplier who ALSO returned on that order
    l3 = l1.select(
        F.col("l_orderkey").alias("l3_ok"), F.col("l_suppkey").alias("l3_sk")
    ).distinct()
    cand = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_ok"))
            & (F.col("l_suppkey") != F.col("l2_sk")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_ok"))
            & (F.col("l_suppkey") != F.col("l3_sk")),
            "left_anti",
        )
    )
    nat = n.filter(F.col("n_name") == "NATION_1")
    return (
        cand.join(F.broadcast(s), cand["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(nat), s["s_nationkey"] == nat["n_nationkey"], "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


def q_streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: dropDuplicatesWithinWatermark — the BOUNDED-state streaming
    dedup (state evicted past the watermark horizon, unlike plain
    streaming dropDuplicates whose key state grows forever). Key set
    equals batch DISTINCT because the full span fits one AvailableNow
    batch; at scale the watermark is the state-size knob."""
    import uuid

    from aproximacion_1_etl_spark.streaming.events import (
        read_events_stream,
    )

    table = f"stream_ddw_{uuid.uuid4().hex[:8]}"
    stream = (
        read_events_stream(spark, sf_dir, "events.parquet")
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    import shutil

    ckpt = tempfile.mkdtemp(prefix="ckpt_ddw_")
    q = (
        stream.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(table)


def q_streaming_incremental_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.9 + §2.10: incremental near-dup AS A STREAM — documents
    arrive in two waves (maxFilesPerTrigger=1 makes each wave its own
    micro-batch); foreachBatch screens the incoming batch against the
    persisted minhash signature store, appends collisions to the
    result table, then appends the batch's own signatures to the
    store. Exactly the production topology: the store outlives the
    stream, each batch pays only its own shingling. Deterministic
    (wave membership by doc_id parity, mtime-ordered file pickup), so
    the result is value-checked against a batch oracle: every
    odd-doc x even-doc LSH collision — wave 1 (even ids) seeds the
    store, wave 2 (odd ids) screens against it."""
    import os
    import time as _time

    from aproximacion_1_etl_spark.text.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    base = tempfile.mkdtemp(prefix="graft_sid_")
    src = os.path.join(base, "src")
    store = os.path.join(base, "store")
    result = os.path.join(base, "result")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "w1")
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "w2")
    )
    # file source picks up oldest-mtime first: pin the wave order
    now = _time.time()
    for d, ts in (("w1", now - 120), ("w2", now - 60)):
        p = os.path.join(src, d)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (ts, ts))

    def handle_batch(batch, batch_id: int) -> None:
        if os.path.isdir(store):
            sigs = batch.sparkSession.read.parquet(store)
            hits = incremental_minhash_dedup(batch, sigs)
            hits.write.mode("append").parquet(result)
        minhash_signatures(
            word_shingles(batch, distinct=False)
        ).write.mode("append").parquet(store)

    import shutil

    ckpt = tempfile.mkdtemp(prefix="ckpt_sid_")
    q = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
        .writeStream.foreachBatch(handle_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(result):
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        return spark.createDataFrame(
            [],
            "doc_new BIGINT, doc_old BIGINT, matching_bands BIGINT, "
            "est_jaccard DOUBLE",
        )
    return _reclaimed(spark.read.parquet(result), base, ckpt)


def q_streaming_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + IVM: the join-view maintenance of ``ivm_join`` AS A
    STREAM — fact CDC arrives in two waves (wave 1: inserts past the
    cutoff + deletes of %97 history; wave 2: price corrections on %89
    history), foreachBatch folds each wave into a VERSIONED snapshot
    of the orders-x-customer view with maintain_join_view (the view
    side moves through broadcast joins only), publishing each batch
    atomically via write_snapshot. Deterministic wave pickup
    (mtime-ordered, maxFilesPerTrigger=1), so the final snapshot is
    value-checked against a from-scratch batch oracle. This is the
    production topology for keeping a denormalized serving table
    current under a CDC feed without nightly re-joins."""
    import os
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.operators.refine import (
        maintain_join_view,
    )
    from aproximacion_1_etl_spark.sources.versioned import (
        read_snapshot,
        write_snapshot,
    )

    cut = "1998-06-01"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    old_facts = o.filter(F.col("o_orderdate") < cut)

    base = tempfile.mkdtemp(prefix="graft_sivm_")
    src = os.path.join(base, "src")
    vpath = os.path.join(base, "view")
    write_snapshot(old_facts.join(dim, "o_custkey"), vpath)

    inserts, updates, deletes = _orders_cdc(o, cut)
    wave1 = inserts.unionByName(deletes)
    wave2 = updates
    wave1.coalesce(1).write.parquet(os.path.join(src, "w1"))
    wave2.coalesce(1).write.parquet(os.path.join(src, "w2"))
    now = _time.time()
    for d, ts in (("w1", now - 120), ("w2", now - 60)):
        p = os.path.join(src, d)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (ts, ts))

    dim_schema = (
        "o_custkey BIGINT, c_name STRING, "
        "c_mktsegment STRING, c_acctbal DOUBLE"
    )

    def handle_batch(batch, batch_id: int) -> None:
        # replay guard: a recovered stream re-delivers the in-flight
        # micro-batch, and re-applying its deltas would double-apply
        # (the anti-drop is idempotent, the refresh-union is not). The
        # batch id travels INSIDE the snapshot commit (written to the
        # version dir before the manifest flips), so "was this batch
        # applied" and "which view state is current" commit atomically
        # — a crash between data write and manifest flip leaves
        # neither visible and the replay applies cleanly.
        from aproximacion_1_etl_spark.sources.versioned import (
            committed_metas,
        )

        if str(batch_id) in committed_metas(vpath):
            return
        bspark = batch.sparkSession
        cur = read_snapshot(bspark, vpath)
        dim_b = (
            load_table(bspark, sf_dir, "customer")
            .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
            .withColumnRenamed("c_custkey", "o_custkey")
        )
        no_dim_changes = bspark.createDataFrame([], dim_schema)
        new = maintain_join_view(
            cur,
            batch,
            dim_b,
            no_dim_changes,
            fact_key="o_orderkey",
            join_key="o_custkey",
        )
        write_snapshot(new, vpath, meta=str(batch_id))

    ckpt = tempfile.mkdtemp(prefix="ckpt_sivm_")
    q = (
        spark.readStream.schema(
            "o_orderkey BIGINT, o_custkey BIGINT, "
            "o_orderdate TIMESTAMP, o_totalprice DOUBLE, op STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
        .writeStream.foreachBatch(handle_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    out = read_snapshot(spark, vpath).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        _fround(F.col("o_totalprice").cast("double"), 2).alias(
            "o_totalprice"
        ),
        "c_name",
        "c_mktsegment",
        _fround(F.col("c_acctbal").cast("double"), 2).alias("c_acctbal"),
    )
    return _reclaimed_dist(out, base, ckpt)


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


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length histogram: 100-char buckets with per-bucket counts
    and char totals — the size-distribution profile a corpus curation
    pass starts from."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.floor(F.col("n_chars") / 100).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


def q_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: events.props JSON parsed to map<string,bigint>
    (not a fixed struct — schema-free key set), then map_keys /
    element access / size."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.size(m).alias("n_props"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
        m.getItem("k").alias("k_val"),
    )


def q_near_dup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 composite: the canonical two-stage near-dup pipeline at
    scale — MinHash-LSH candidate generation (sub-quadratic) followed
    by exact 3-gram Jaccard verification computed ONLY for candidate
    pairs. The verify join fans each candidate pair out to its shingle
    intersections; cost is |candidates| x avg-shingles, never
    |docs|^2."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(word_shingles(docs, distinct=False))
    cands = minhash_candidate_pairs(sigs, min_matching_bands=2)
    sh = word_shingles(docs, distinct=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingle").alias("a_sh"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingle").alias("b_sh"))
    inter = (
        cands.join(sa, cands["doc_a"] == sa["a_id"])
        .join(sb, (cands["doc_b"] == sb["b_id"]) & (F.col("a_sh") == F.col("b_sh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("za_id"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("zb_id"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(za), inter["doc_a"] == za["za_id"])
        .join(F.broadcast(zb), inter["doc_b"] == zb["zb_id"])
        .select(
            "doc_a",
            "doc_b",
            (
                F.floor(
                    F.col("n_inter")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
        .select(
            "doc_a",
            "doc_b",
            _fround(F.col("jaccard"), 4).alias("jaccard"),
        )
    )


def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse_json ->
    variant_get path extraction — schema-on-read without declaring a
    struct/map, the engine's answer to evolving JSON payloads."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        k.isNotNull().alias("has_k"),
    )


def q_listagg_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg WITHIN GROUP (ordered string aggregation): each
    customer's order-status history as one ordered CSV string."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.expr(
            "listagg(o_orderstatus, ',') "
            "within group (order by o_orderdate, o_orderkey)"
        ).alias("status_seq")
    )


def q_unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot -> unpivot roundtrip: per-priority status counts widened
    to columns (pivot) then melted back to long form (unpivot/melt) —
    both reshape directions of the engine."""
    o = load_table(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
    )
    return (
        wide.unpivot(
            ["o_orderpriority"], statuses, "o_orderstatus", "n_orders"
        )
        .filter(F.col("n_orders").isNotNull())
        .select(
            "o_orderpriority",
            "o_orderstatus",
            F.col("n_orders").cast("bigint").alias("n_orders"),
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


def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style (adapted: testdata has no partsupp, so supply
    cost(part, supplier) = the minimum extendedprice the pair ever
    traded at in lineitem): for LARGE parts of size < 26, keep only the
    EUROPE supplier(s) offering the per-part minimum cost — the
    correlated-min subquery shape, de-correlated into a per-part min
    aggregate + equality join (Catalyst's own strategy for Q2).
    Region/nation/part filters are applied BEFORE the lineitem
    aggregate so the big scan reduces early; dimension sides broadcast.
    Reference parity: joins of this shape are the SP layer's key-equi
    pattern (DAG_cloudrun_dataflow_sp.py:146-191)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            n["n_regionkey"] == r["r_regionkey"],
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    psel = p.filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 26)
    ).select("p_partkey", "p_type")
    cost = (
        li.join(F.broadcast(eu), li["l_suppkey"] == eu["s_suppkey"])
        .join(F.broadcast(psel), li["l_partkey"] == psel["p_partkey"])
        .groupBy("p_partkey", "s_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    # Per-part min via a window over the aggregate's own partitioning
    # (one shuffle on p_partkey) instead of a second groupBy + self
    # equi-join — audited: 2 exchanges total vs 5 for the join form.
    mn = F.min("cost").over(Window.partitionBy("p_partkey"))
    return (
        cost.withColumn("mn", mn)
        .filter(F.col("cost") == F.col("mn"))
        .join(F.broadcast(eu), "s_suppkey")
        .join(F.broadcast(psel), "p_partkey")
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            _fround(F.col("cost"), 2).alias("supply_cost"),
        )
    )


def q_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style (adapted: profit = discounted revenue, no
    supplycost in testdata): per (supplier nation, ship year) profit
    over parts whose name contains 'red' — the classic star join
    (fact x 2 small dims broadcast) feeding a two-key aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pn = p.filter(F.col("p_name").contains("red")).select("p_partkey")
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", "n_name"
    )
    return (
        li.join(F.broadcast(pn), li["l_partkey"] == pn["p_partkey"])
        .join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_profit")
        )
    )


def q_q11_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style (adapted: part 'stock value' = sum of
    extendedprice x quantity traded by NATION_9 suppliers): keep parts
    whose value exceeds 0.01% of the national total — a global scalar
    subquery broadcast against the per-part aggregate. The threshold
    compare happens on exact decimal sums cast to double (identically
    in the oracle) BEFORE display rounding, so the cut is
    engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nat = (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_9")),
            s["s_nationkey"] == n["n_nationkey"],
        )
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(nat), li["l_suppkey"] == nat["s_suppkey"], "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(30,8)"
                )
            ).alias("v")
        )
    )
    tot = val.agg(F.sum("v").cast("double").alias("t"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("v").cast("double") > F.col("t") * 0.0001)
        .select(
            "l_partkey",
            _fround(F.col("v").cast("double"), 2).alias("part_value"),
        )
    )


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: near-dup CLUSTER assignment — MinHash-LSH candidate pairs
    (as in near_dup_verified) closed under transitivity via iterative
    min-label connected components, yielding (doc_id, cluster_id, keep)
    where exactly one doc per cluster is kept. This is the decision
    step of corpus dedup: A~B and B~C collapse to one kept doc even
    when A~C never met in any LSH bucket."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(word_shingles(docs, distinct=False))
    cands = minhash_candidate_pairs(sigs, min_matching_bands=2)
    return dedup_clusters(cands)


def q_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 mergeable-sketch distinct counts with a value-checked error
    contract: per-source HyperLogLog sketches over document tokens,
    merged with hll_union_agg into a corpus-wide estimate WITHOUT
    re-scanning — the map-side-combinable sketch pattern that replaces
    count(DISTINCT) at 100 TB. Because estimates are engine-specific,
    the hashed output carries the EXACT distinct counts (computed here
    purely to make the accuracy claim driver-checkable; a production
    run would emit only the estimate) plus a boolean asserting the
    estimate is within 5% (lgConfigK=12 -> rsd ~1.6%)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    est_ok = (
        F.abs(F.col("est") - F.col("n_exact"))
        <= F.greatest(F.lit(2.0), F.lit(0.05) * F.col("n_exact"))
    ).alias("est_ok")
    per_source = toks.groupBy("source").agg(
        F.hll_sketch_agg("tok").alias("sk"),
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_exact"),
    )
    per = per_source.select(
        "source",
        "n_tokens",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.hll_sketch_estimate("sk").alias("est"),
    ).select("source", "n_tokens", "n_exact", est_ok)
    all_row = (
        per_source.agg(
            F.sum("n_tokens").alias("n_tokens"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        )
        .crossJoin(
            F.broadcast(toks.agg(F.countDistinct("tok").alias("n_exact")))
        )
        .select(
            F.lit("ALL").alias("source"),
            "n_tokens",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            est_ok,
        )
    )
    return per.unionByName(all_row)


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


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key z-score outlier flagging (§2.6 extension): events whose
    value deviates > 2 population standard deviations from their user's
    mean. Two-pass agg + broadcast join-back instead of a whole-partition
    window: the aggregate reduces 10 k rows/user to one stats row, so at
    100 TB the second pass is a broadcast hash join, not a re-shuffle of
    every event into user-partitions. Moments use decimal-cast sums so
    the mean/variance are summation-order independent (oracle parity)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,8)")).alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,8)")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    stats = stats.select(
        "user_id", mean.alias("mu"), F.sqrt(var).alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "user_id")
        .select(
            "event_id",
            "user_id",
            _fround(F.col("value"), 2).alias("value"),
            _fround(z, 3).alias("z"),
        )
        .where(F.abs(F.col("z")) > 2.0)
    )


def q_haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo nearest-facility assignment (reference stores per-order
    geo_location lat/lon, app.py:48): each customer (synthetic
    deterministic coordinates) is matched to its closest facility
    (one per nation) by haversine distance. Broadcast the 25-row
    facility dim -> the cross product never shuffles the big side;
    distance math is all JVM-side built-ins (whole-stage codegen)."""
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("f_key"),
        F.col("n_name").alias("f_name"),
        (F.lit(-60.0) + F.col("n_nationkey") * F.lit(4.8)).alias("f_lat"),
        (F.lit(-170.0) + F.col("n_nationkey") * F.lit(13.7)).alias("f_lon"),
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            (F.lit(-55.0) + (F.col("c_custkey") % 110).cast("double")).alias("c_lat"),
            (F.lit(-180.0) + ((F.col("c_custkey") * 7) % 360).cast("double")).alias(
                "c_lon"
            ),
        )
    )
    joined = cust.crossJoin(F.broadcast(nation))
    sdlat = F.sin(F.radians(F.col("f_lat") - F.col("c_lat")) / 2)
    sdlon = F.sin(F.radians(F.col("f_lon") - F.col("c_lon")) / 2)
    a = sdlat * sdlat + F.cos(F.radians("c_lat")) * F.cos(F.radians("f_lat")) * sdlon * sdlon
    dist = _fround(F.lit(12742.0) * F.asin(F.sqrt(a)), 1)
    ranked = joined.select("c_custkey", "f_name", dist.alias("dist_km"))
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("dist_km").asc(), F.col("f_name").asc()
    )
    return ranked.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")


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


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 importance-weighted data mixing: A-ES weighted sampling
    without replacement — top 25 documents per language, selection
    probability proportional to length (functions/sampling.py::
    weighted_sample_topk). Deterministic by key hash, so the oracle
    reproduces the identical sample."""
    from aproximacion_1_etl_spark.functions.sampling import (
        weighted_sample_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    picked = weighted_sample_topk(
        docs, key_col="doc_id", weight_col="n_chars", k=25, strata_col="lang"
    )
    return picked.select(
        "lang", "doc_id", _fround(F.col("sample_score"), 6).alias("score")
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (posting lists) over the document corpus:
    token -> document frequency + the first 10 posting doc_ids. The
    exploded (token, doc) stream reduces map-side before the single
    shuffle on token; posting arrays are bounded with slice so no
    unbounded collect_set blows executor memory at 100 TB (cap BEFORE
    materializing would use a windowed top-k at real scale)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
            )
        ).alias("token"),
    ).where(F.length("token") >= 3)
    # Cap postings BEFORE materializing the list (windowed top-10 per
    # token) so no unbounded collect_set sits in executor memory; the
    # window and the groupBy share the token key, so Catalyst plans ONE
    # exchange for both (measured: 4.0s -> bounded at 10x dup-heavy
    # data, see PERF.md scale-up experiment 2).
    w = Window.partitionBy("token").orderBy("doc_id")
    ranked = toks.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("token")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rn") <= 10, F.col("doc_id"))
                    )
                ).cast("array<string>"),
            ).alias("postings"),
        )
        .where(F.col("df") >= 50)
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline chunking: split each document into fixed-size
    character windows with 25% overlap (stride 300, width 400). The
    chunk grid is computed per-row with sequence() + posexplode — a
    narrow fan-out, no shuffle at all; at 100 TB chunking composes
    with the scan and any downstream repartition is the consumer's
    choice."""
    docs = load_table(spark, sf_dir, "documents")
    width, stride = 400, 300
    offsets = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((F.col("n_chars") - width) / F.lit(float(stride))), F.lit(0)
        ).cast("int"),
    )
    piece = F.substring(F.col("text"), F.col("chunk_id") * stride + 1, width)
    return (
        docs.select(
            "doc_id",
            "lang",
            "text",
            F.posexplode(offsets).alias("chunk_id", "_i"),
        )
        .select(
            "doc_id",
            "lang",
            "chunk_id",
            (F.col("chunk_id") * stride).cast("bigint").alias("chunk_start"),
            F.length(piece).cast("bigint").alias("chunk_len"),
            F.md5(piece).alias("chunk_hash"),
        )
        .where(F.col("chunk_len") > 0)
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: assign documents (ordered by doc_id
    within language) to fixed token-budget bins by running-sum
    division — the deterministic streaming-pack used to batch training
    sequences. One window pass (running sum) + one reduce per bin;
    both engines compute the identical assignment because the order
    and arithmetic are exact integers."""
    budget = 4096
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = docs.select(
        "doc_id",
        "lang",
        "n_tokens",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget)
        .cast("bigint")
        .alias("bin_id"),
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (ops surface for the reference's daily re-publish,
    M2/M14): compare yesterday's master (orders < 1998) against
    today's (orders < 1999, statuses uppercased-after-merge shape) and
    classify every key as added / deleted / changed / unchanged via one
    full-outer join on the key with row-hash compare. One shuffle on
    the join key; row hashes are computed before the join so the
    compare is O(1) per row (and the hash, not the row, is what a
    100 TB diff would persist)."""
    o = load_table(spark, sf_dir, "orders")
    price_str = F.col("o_totalprice").cast("decimal(12,2)").cast("string")
    old = o.where(F.col("o_orderdate") < "1998-01-01").select(
        "o_orderkey",
        F.md5(F.concat_ws("|", F.col("o_orderstatus"), price_str)).alias("h"),
    )
    new = o.where(F.col("o_orderdate") < "1999-01-01").select(
        "o_orderkey",
        F.md5(
            F.concat_ws(
                "|",
                F.when(
                    F.col("o_orderdate") >= "1997-01-01", F.lit("O")
                ).otherwise(F.col("o_orderstatus")),
                price_str,
            )
        ).alias("h"),
    )
    j = old.alias("a").join(
        new.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full"
    )
    status = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("deleted"))
        .when(F.col("a.h") == F.col("b.h"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(status.alias("diff_status"))
        .groupBy("diff_status")
        .agg(F.count("*").alias("n_keys"))
    )


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy-based quality filter (§2.10): Shannon entropy of each
    document's token distribution — low entropy flags repetitive /
    boilerplate text (complements text/dedup.py::repetition_profile).
    Two keyed reduces (token counts, then per-doc entropy terms), both
    map-side combinable; entropy terms are decimal-cast before the sum
    so the result is summation-order independent (oracle parity)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    totals = tf.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    term = (-p * F.log2(p)).cast("decimal(30,8)")
    ent = (
        tf.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_tokens"),
            _fround(F.sum(term).cast("double"), 4).alias("entropy"),
        )
    )
    return ent.select(
        "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"), "entropy"
    ).where(F.col("entropy") < 4.5)


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule suite over the work tables (functions/
    quality.py): row-level rules fused into ONE scan of orders, plus a
    uniqueness shuffle and a referential anti-join (broadcast: customer
    is the dim side). The reference runs 29 SPs with zero validation
    between steps; this is the guardrail a production chain needs."""
    from aproximacion_1_etl_spark.functions.quality import (
        fk_violations,
        row_rule_violations,
        unique_violations,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    row_rules = row_rule_violations(
        o,
        {
            "custkey_not_null": F.col("o_custkey").isNull(),
            "status_accepted_values": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "totalprice_positive": F.col("o_totalprice") <= 0,
            "priority_format": ~F.col("o_orderpriority").rlike("^[1-5]-"),
        },
    )
    return (
        row_rules.unionByName(unique_violations(o, ["o_orderkey"], "orderkey_unique"))
        .unionByName(
            fk_violations(o, "o_custkey", F.broadcast(c), "c_custkey", "custkey_fk")
        )
    )


def q_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (late-arriving-fact correctness): each
    purchase event is joined to the SCD2 state interval (signup/error
    stream -> validity windows, operators/refine.py::scd2_history)
    valid AT the purchase timestamp — an equi-join on user_id with the
    interval bounds as join filters, so Catalyst still plans a keyed
    join (one shuffle), not a cartesian."""
    from aproximacion_1_etl_spark.operators.refine import scd2_history

    ev = load_table(spark, sf_dir, "events")
    states = ev.where(F.col("event_type").isin("signup", "error"))
    hist = scd2_history(
        states,
        keys=["user_id"],
        ts_col="ts",
        tiebreak="event_id",
        attrs=["event_type"],
    ).select(
        F.col("user_id").alias("s_user"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    cond = (
        (facts.user_id == hist.s_user)
        & (hist.valid_from <= facts.ts)
        & (facts.ts < F.coalesce(hist.valid_to, F.lit("9999-12-31").cast("timestamp")))
    )
    return facts.join(hist, cond, "left").select(
        "event_id",
        "user_id",
        _ts_str(F.col("ts")).alias("purchase_ts"),
        _fround(F.col("value"), 2).alias("value"),
        "state",
    )


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-20 bigrams by pointwise mutual
    information. Bigrams come from a lead() window over the exploded
    token stream (one shuffle on doc_id); PMI is computed from exact
    integer counts (c_ab * N / (c_a * c_b)) so both engines agree
    bit-for-bit; final selection is a distributed top-k
    (TakeOrderedAndProject), not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        F.col("tok").alias("tok_a"), F.lead("tok").over(w).alias("tok_b")
    ).where(F.col("tok_b").isNotNull())
    c_ab = pairs.groupBy("tok_a", "tok_b").agg(F.count("*").alias("n_ab"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("n"))
    tot = toks.agg(F.count("*").alias("n_total"))
    pmi = F.log2(
        F.col("n_ab") * F.col("n_total") / (F.col("n_a") * F.col("n_b"))
    )
    return (
        c_ab.where(F.col("n_ab") >= 5)
        .join(
            F.broadcast(uni.select(F.col("tok").alias("tok_a"), F.col("n").alias("n_a"))),
            "tok_a",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("tok_b"), F.col("n").alias("n_b"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "tok_a",
            "tok_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            _fround(pmi, 4).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("tok_a").asc(), F.col("tok_b").asc())
        .limit(20)
    )


def q_corpus_to_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-sequence builder — the LLM-pipeline
    flagship: quality gate -> overlapping chunking -> exact chunk-level
    dedup (content hash) -> context-window packing, in ONE declarative
    plan. Shuffle budget: dedup's hash shuffle + packing's per-lang
    window + the final rollup; chunking itself is narrow. Every stage
    is JVM-side (md5 / substring / running sum) — no Python in the
    path, so the same plan scales to a 1000-executor corpus build."""
    width, stride, budget = 400, 300, 4096
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") >= 200)
    offsets = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((F.col("n_chars") - width) / F.lit(float(stride))), F.lit(0)
        ).cast("int"),
    )
    piece = F.substring(F.col("text"), F.col("chunk_id") * stride + 1, width)
    chunks = (
        docs.select(
            "doc_id",
            "lang",
            "text",
            F.posexplode(offsets).alias("chunk_id", "_i"),
        )
        .select(
            "doc_id",
            "lang",
            "chunk_id",
            F.length(piece).cast("bigint").alias("chunk_len"),
            F.md5(piece).alias("chunk_hash"),
        )
        .where(F.col("chunk_len") >= 50)
    )
    w_dedup = Window.partitionBy("chunk_hash").orderBy(
        F.col("doc_id").asc(), F.col("chunk_id").asc()
    )
    uniq = (
        chunks.withColumn("rn", F.row_number().over(w_dedup))
        .where("rn = 1")
        .drop("rn")
    )
    w_pack = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = uniq.select(
        "lang",
        "doc_id",
        "chunk_len",
        (F.coalesce(F.sum("chunk_len").over(w_pack), F.lit(0)) / budget)
        .cast("bigint")
        .alias("bin_id"),
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("chunk_len").alias("bin_chars"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


def q_rest_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 as a registered Spark 4 Python DataSource
    (sources/rest_datasource.py): the paginated REST extract read via
    spark.read.format("rest_orders") — one task per (day, page)
    InputPartition, so retries/speculation are per-page and the source
    composes with column pruning like any built-in format."""
    from aproximacion_1_etl_spark.sources.rest_datasource import register

    register(spark)
    df = (
        spark.read.format("rest_orders")
        .option("start_date", "2024-01-01")
        .option("n_days", 3)
        .option("max_pages", 2)
        .load()
    )
    return df.select(
        "order_id", "fetch_date", "page", _fround(F.col("amount"), 2).alias("amount")
    )


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL correlated subquery (Spark 4 SQL surface): per-nation
    top-3 customers by balance, expressed as a lateral per-row subquery
    instead of a window — Catalyst decorrelates it into a ranked join,
    so the SQL sugar costs nothing at scale."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, x.c_name,
               floor(x.c_acctbal * 100.0 + 0.5) / 100.0 AS acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name ASC LIMIT 3) x
        """
    )


def q_qualify_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-style windowed filter in ONE SQL block (the classic
    decision-support shape the suite lacked): per-nation top-2
    suppliers by exact decimal revenue. OSS Spark has no QUALIFY
    keyword, so this is the canonical rewrite — the window in an
    inline subquery, filtered one level up; the DuckDB oracle runs the
    literal QUALIFY form, proving the rewrite IS that semantics.
    Catalyst plans the filter-on-rank as a running TopK per partition
    (WindowGroupLimit pushes rn <= 2 below the sort), so the window
    never materializes full partitions — the form that survives a
    1000-way nation skew at 100 TB."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, s_name,
               floor(CAST(revenue AS DOUBLE) * 100.0 + 0.5) / 100.0
                 AS revenue,
               CAST(rn AS INT) AS rn
        FROM (
          SELECT n.n_name, s.s_name, r.revenue,
                 row_number() OVER (
                   PARTITION BY n.n_name
                   ORDER BY r.revenue DESC, s.s_name ASC) AS rn
          FROM (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(38,6))) AS revenue
            FROM lineitem GROUP BY 1) r
          JOIN supplier s ON s.s_suppkey = r.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey)
        WHERE rn <= 2
        """
    )


def q_correlated_scalar_subquery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated scalar subquery in SELECT position (TPC-H q17's
    inner shape, surfaced as its own key): each part priced against
    its brand's average retail price, the average written as a
    per-row correlated subquery. Catalyst DECORRELATES it into one
    brand-grain aggregate + an equi-join — the SQL sugar costs one
    shuffle on p_brand, never a per-row subquery execution (the plan
    a naive engine would run |part| times). The subquery is written
    ONCE and the derived flag computed a level up — repeating the
    correlated expression would plan a second identical aggregate.
    Decimal sum / count keeps the average engine-identical."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_brand,
               floor(raw_price * 100.0 + 0.5) / 100.0 AS price,
               floor(raw_avg * 100.0 + 0.5) / 100.0 AS brand_avg_price,
               CASE WHEN raw_price > raw_avg THEN 1 ELSE 0 END
                 AS above_avg
        FROM (
          SELECT p_partkey, p_brand, p_retailprice AS raw_price,
                 (SELECT CAST(sum(CAST(p2.p_retailprice
                                       AS DECIMAL(38,6)))
                              AS DOUBLE) / count(*)
                  FROM part p2
                  WHERE p2.p_brand = p.p_brand) AS raw_avg
          FROM part p)
        """
    )


def q_rest_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1+§2.9 STREAMING REST ingestion (Spark 4 Python streaming
    data source): the paginated extractor as a readStream — one fetch
    day per microbatch, the day cursor living in the ENGINE's
    checkpoint as the stream offset (rest_datasource.py::
    RestOrdersStreamReader), deterministic replay via
    readBetweenOffsets => exactly-once into the parquet sink. The
    batch rest_orders source covers backfills; this is the daemon
    form the reference's cron loop approximates. The stream idles on
    an unchanged offset once the window is exhausted; the driver stops
    it when the committed offset reaches the window end."""
    import ast as _ast
    import json as _json
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.sources.rest_datasource import register

    register(spark)
    sink = tempfile.mkdtemp(prefix="graft_rsi_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_rsi_")
    try:
        q = (
            spark.readStream.format("rest_orders")
            .option("start_date", "2024-01-01")
            .option("n_days", 3)
            .option("max_pages", 2)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        # the stream MUST be stopped before the finally rmtree runs —
        # an exception escaping the poll loop would otherwise leave a
        # zombie query triggering against deleted dirs for the rest of
        # the session, so the stop lives in its own finally
        window_done = False
        try:
            deadline = _time.time() + 120
            while _time.time() < deadline:
                p = q.lastProgress
                if p and p.get("sources"):
                    eo = p["sources"][0].get("endOffset")
                    off = None
                    if isinstance(eo, str):
                        # Python-source offsets surface in progress as
                        # the dict's repr (single quotes), not JSON
                        try:
                            off = _json.loads(eo)
                        except ValueError:
                            try:
                                off = _ast.literal_eval(eo)
                            except (ValueError, SyntaxError):
                                off = None
                    elif eo is not None:
                        off = eo
                    if (
                        isinstance(off, dict)
                        and int(off.get("day_index", 0)) >= 3
                    ):
                        window_done = True
                        break  # progress reports AFTER batch commit
                _time.sleep(0.2)
        finally:
            q.stop()
            q.awaitTermination()
        if not window_done:
            # aggregating a partial sink would surface much later as
            # an opaque value mismatch — fail loudly at the source
            raise TimeoutError(
                "rest_stream_ingest: committed stream offset did not "
                "reach day_index 3 within the 120 s poll deadline; "
                "refusing to aggregate a partial sink"
            )
        out = (
            spark.read.parquet(sink)
            .groupBy("fetch_date")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.floor(F.col("amount") * 100.0 + F.lit(0.5))
                    .cast("bigint")
                ).cast("bigint").alias("sum_amount_cents"),
            )
        )
        return _reclaimed(out, sink, ckpt)
    finally:
        if os.path.isdir(sink):
            shutil.rmtree(sink, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def q_sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT clause (the wide->long inverse of pivot_status,
    §2.6/§2.7 surface): per-nation customer metrics computed ONCE in
    wide form, then unpivoted to (nation, metric, value) rows — the
    report-friendly long grain. UNPIVOT is a zero-shuffle projection
    (each wide row explodes to |metrics| rows map-side); the only
    exchange is the metric aggregate itself. Values are decimal-exact
    before the final rounding; both engines run their native UNPIVOT
    syntax."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, metric,
               floor(val * 100.0 + 0.5) / 100.0 AS value
        FROM (
          SELECT n.n_name,
                 CAST(count(*) AS DOUBLE) AS n_customers,
                 CAST(sum(CAST(c.c_acctbal AS DECIMAL(38,6)))
                      AS DOUBLE) AS total_balance,
                 CAST(max(c.c_acctbal) AS DOUBLE) AS max_balance
          FROM customer c
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY 1)
        UNPIVOT (val FOR metric IN (
          n_customers, total_balance, max_balance))
        """
    )


def q_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series scalar pandas UDF (§2.8 — the remaining UDF
    form): order totals bucketed by binary search over fixed
    breakpoints, where the iterator form runs the one-off setup (the
    sorted search table; in production a model/tokenizer load) ONCE
    per executor Python worker instead of once per batch. The UDF is
    a narrow map; the only shuffle is the bucket rollup after it.
    Integer bucket ids keep it value-checked (oracle: a CASE ladder
    counting breakpoints <= price)."""
    from aproximacion_1_etl_spark.operators.pandas_ops import (
        price_bucket_iter_udf,
    )

    bucket = price_bucket_iter_udf([50000.0, 100000.0, 200000.0, 400000.0])
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(bucket(F.col("o_totalprice")).alias("bucket"),
                 F.col("o_totalprice").alias("p"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(
                F.floor(F.col("p") * 100.0 + F.lit(0.5)).cast("bigint")
            ).cast("bigint").alias("sum_cents"),
        )
        .select(F.col("bucket").cast("int").alias("bucket"),
                "n_orders", "sum_cents")
    )


def q_grouped_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow grouped map (§2.8 — Spark 4's Arrow-native grouped
    surface, zero pandas boxing): per-nation customer balance stats
    computed directly on pyarrow arrays. Balances become exact integer
    CENTS before summation (floor(x*100+0.5) on each element), so the
    per-group result is addition-order-independent — value-checkable
    although Arrow sees group rows in arbitrary post-shuffle order.
    One shuffle on the group key; the Python stage is
    |group|-bounded."""
    from aproximacion_1_etl_spark.operators.pandas_ops import (
        grouped_balance_stats_arrow,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_acctbal"
    )
    return grouped_balance_stats_arrow(c, "c_nationkey", "c_acctbal")


def q_streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 native streaming dedup: dropDuplicatesWithinWatermark over
    two arrival waves where wave 2 REPLAYS wave 1's events verbatim
    (at-least-once upstream delivery, the case this operator exists
    for) — the engine's state store admits each event_id once and the
    parquet sink receives exactly the distinct events. The watermark
    delay (365 d) exceeds the event span, so no dedup state expires
    mid-run and the result equals batch DISTINCT — which is the
    oracle. State is |distinct keys|-bounded and the sink is
    append-only; contrast the foreachBatch signature-store dedup
    (streaming_incremental_dedup), which owns its state explicitly."""
    import shutil
    import time as _time

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    base = tempfile.mkdtemp(prefix="graft_sdw_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_sdw_")
    src = os.path.join(base, "src")
    sink = os.path.join(base, "sink")
    try:
        ev.coalesce(1).write.parquet(os.path.join(src, "w1"))
        ev.coalesce(1).write.parquet(os.path.join(src, "w2"))
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        schema = (
            "event_id BIGINT, ts TIMESTAMP, event_type STRING, "
            "value DOUBLE"
        )
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .withWatermark("ts", "365 days")
            .dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(sink)
            .groupBy("event_type")
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.sum(
                    F.floor(F.col("value") * 100.0 + F.lit(0.5))
                    .cast("bigint")
                ).cast("bigint").alias("sum_value_cents"),
            )
        )
        return _reclaimed(out, base, ckpt)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 SQL surface): ancestor chains over a
    derived hierarchy (nation n reports to n-5), returning each node's
    root and depth — the fixed-point iteration dup_clusters implements
    with a DataFrame loop, here in pure SQL."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
          SELECT n_nationkey AS node, n_nationkey AS root,
                 0 AS depth
          FROM nation WHERE n_nationkey < 5
          UNION ALL
          SELECT n.n_nationkey, a.root, a.depth + 1
          FROM nation n JOIN anc a ON n.n_nationkey - 5 = a.node
        )
        SELECT node, root, CAST(depth AS INT) AS depth FROM anc
        """
    )


def q_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide sentence-level dedup with document reconstruction
    (C4/RefinedWeb-style boilerplate removal): split docs into
    sentences, keep only each sentence's FIRST corpus occurrence
    (hash + row_number, deterministic), then reassemble documents from
    their surviving sentences in order. One shuffle on sentence hash +
    one reduce back onto doc_id; reconstruction uses an order-preserving
    array_sort over (pos, sentence) structs, not a window."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    sents = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\\. ")).alias("pos", "sent"),
    ).where(F.length("sent") > 0)
    w = Window.partitionBy(F.md5(F.col("sent"))).orderBy(
        F.col("doc_id").asc(), F.col("pos").asc()
    )
    kept = sents.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                ". ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("sent")))
                    ),
                    lambda s: s["sent"],
                ),
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            F.col("n_kept").cast("bigint").alias("n_kept"),
            F.md5(F.col("clean_text")).alias("clean_hash"),
            F.length(F.col("clean_text")).cast("bigint").alias("clean_len"),
        )
    )


def q_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-line ingestion surface (``spark.read.text``): events are
    serialized as one log line per row, landed as plain text files, read
    back line-oriented, and re-parsed with ``regexp_extract`` — the
    semi-structured-log path the reference's JSON-only ingest lacks.
    Money travels as integer cents inside the line so both engines
    format/parse bit-identically (no float printf divergence)."""
    ev = load_table(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="graft_log_")
    lines = ev.select(
        F.format_string(
            "evt=%d ts=%s user=%d type=%s cents=%d",
            F.col("event_id"),
            _ts_str("ts"),
            F.col("user_id"),
            F.col("event_type"),
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"),
        ).alias("value")
    )
    lines.repartition(4).write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    pat = r"evt=(\d+) ts=(.+) user=(\d+) type=(\w+) cents=(-?\d+)"
    parsed = raw.select(
        F.regexp_extract("value", pat, 1).cast("bigint").alias("event_id"),
        F.regexp_extract("value", pat, 4).alias("event_type"),
        F.regexp_extract("value", pat, 5).cast("bigint").alias("cents"),
    )
    out = parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("total_cents"),
        F.min("event_id").alias("first_event"),
    )
    return _reclaimed(out, path)


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization with ``parse_url`` (host / path / query-param
    extraction, tracking-param strip) — the dedup key-prep step of any
    web-scale corpus pipeline. URLs are synthesized deterministically
    from the documents table, then decomposed with the engine's URL
    functions; canonical identity = (host, path, id param) with
    utm_*/ref stripped."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?id="),
        F.col("doc_id"),
        F.lit("&utm_source=feed&ref="),
        F.col("lang"),
    )
    u = d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id"))
        .cast("bigint")
        .alias("id_param"),
    )
    canon = u.select(
        "doc_id",
        "host",
        F.concat(F.lit("https://"), F.col("host"), F.col("path"), F.lit("?id="), F.col("id_param")).alias("canonical_url"),
    )
    return canon.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.min("canonical_url").alias("first_url"),
    )


def q_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 collations: a mixed-case
    event_type column (upper-cased on even ids) groups under
    ``UTF8_LCASE`` collation without materializing a lowercased copy —
    collation-aware comparison happens inside the hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(
            F.col("event_id") % 2 == 0, F.upper("event_type")
        ).otherwise(F.col("event_type")).alias("type_mixed"),
        "value",
    )
    g = mixed.groupBy(
        F.collate(F.col("type_mixed"), "UTF8_LCASE").alias("k")
    ).agg(
        F.count("*").alias("n"),
        _dsum(F.col("value")).alias("total_value"),
    )
    # emit a deterministic representative (the collated group may pick
    # any case variant as its key value)
    return g.select(
        F.lower(F.col("k")).alias("event_type"),
        "n",
        "total_value",
    )


def q_sql_script_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN/END blocks with DECLARE/SET) — the
    engine-native form of the reference's BigQuery stored procedures
    (`Composer/DAG_cloudrun_dataflow_sp.py:90-318`): a multi-statement
    script computes a threshold into a variable, then the final SELECT
    uses it; control flow lives in the engine, not an external
    orchestrator."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE avg_bal DOUBLE;
          SET avg_bal = (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0);
          SELECT n.n_name,
                 CAST(count(*) AS BIGINT) AS n_rich,
                 floor(sum(CAST(c.c_acctbal AS DECIMAL(30,8)))
                       * 100.0 + 0.5) / 100.0 AS total_bal
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE c.c_acctbal > avg_bal
          GROUP BY n.n_name;
        END
        """
    )


def q_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (INSERT OVERWRITE of only the
    partitions present in the incoming batch): the engine-native form of
    the reference's per-day re-landing (`app.py:122-133` rewrites one
    day's file; here one year's partition is replaced, all others
    untouched — no read-modify-write of the whole table)."""
    o = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="graft_dynover_")
    base = o.withColumn("order_year", F.year("o_orderdate"))
    base.repartition("order_year").write.mode("overwrite").partitionBy(
        "order_year"
    ).parquet(path)
    # re-land ONLY 1997, with a 10% discount applied; the per-write
    # option scopes dynamic mode to this writer (a session-level conf
    # would silently change every later partitioned overwrite)
    patch = base.filter(F.col("order_year") == 1997).withColumn(
        "o_totalprice", F.col("o_totalprice") * 0.9
    )
    patch.repartition("order_year").write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("order_year").parquet(path)
    final = spark.read.parquet(path)
    out = final.groupBy("order_year").agg(
        F.count("*").alias("n"),
        _dsum(F.col("o_totalprice")).alias("total"),
    )
    return _reclaimed(out, path)


def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable count-min sketch (§2.6 sketch family, with
    hll_sketch_union): per-partition CMS partials merge associatively in
    the JVM aggregate, then the driver queries the merged sketch for
    each candidate key — frequency estimation with fixed memory no
    matter the stream size. Estimates are >= true counts (one-sided
    error) and within eps*N; both claims ride in the hashed output as a
    boolean next to the exact counts (DuckDB has no CMS, so the oracle
    emits the exact counts and TRUE — a broken bound now fails the
    driver gate, not just the pytest)."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.count_min_sketch(
            F.col("event_type"), F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("sketch")
    ).collect()[0]["sketch"]
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk)
    )
    rows = [(t, int(cms.estimateCount(t))) for t in sorted(types)]
    est_df = spark.createDataFrame(
        rows, "event_type STRING, est_count BIGINT"
    )
    true_cnt = ev.groupBy("event_type").agg(
        F.count("*").alias("true_cnt")
    )
    totals = true_cnt.agg(F.sum("true_cnt").alias("n_total"))
    return (
        true_cnt.join(F.broadcast(est_df), "event_type")
        .crossJoin(F.broadcast(totals))
        .select(
            "event_type",
            F.col("true_cnt").cast("bigint").alias("true_cnt"),
            (
                (F.col("est_count") >= F.col("true_cnt"))
                & (
                    F.col("est_count")
                    <= F.col("true_cnt")
                    + F.lit(0.001) * F.col("n_total")
                    + F.lit(1)
                )
            ).alias("est_ok"),
        )
    )


def q_approx_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy-hitter aggregate: top event types with
    estimated counts from a bounded-memory summary. With maxItemsTracked
    >= the distinct count the estimate is exact, so the oracle checks it
    against plain GROUP BY counts."""
    ev = load_table(spark, sf_dir, "events")
    topk = ev.agg(
        F.expr("approx_top_k(event_type, 10, 10000)").alias("tk")
    ).select(F.explode("tk").alias("e"))
    return topk.select(
        F.col("e.item").alias("event_type"),
        F.col("e.count").cast("bigint").alias("n"),
    )


def q_execute_immediate_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL via EXECUTE IMMEDIATE ... USING — the engine
    form of the reference's parameterized procedures
    (`insert_table_temp(n)`, DAG:193-246, called with n=1,2,3,0): one
    statement template, bind values at call time, no string splicing.
    Binds the n-th-order rank and a status filter."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_custkey,
                  CAST(count(*) AS BIGINT) AS n_orders,
                  min(o_orderkey) AS sample_order
           FROM (SELECT *, row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
                 FROM orders WHERE o_orderstatus = ?)
           WHERE rn <= ? GROUP BY 1'
          USING 'F', 2
        """
    )


def q_auto_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven recursive struct flattening: a nested order record
    (order + customer sub-struct + geo sub-sub-struct, the reference's
    ~100-field shape, app.py:37-98) flattens to dotted-name columns with
    zero per-field code. The nested struct is built then flattened back
    — the output hash proves lossless field lifting."""
    from aproximacion_1_etl_spark.functions.cleaning import flatten_struct

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nested = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "o_orderkey",
            F.struct(
                F.col("c_name").alias("name"),
                F.col("c_mktsegment").alias("segment"),
                F.struct(
                    F.col("c_nationkey").alias("nation"),
                    _fround(F.col("c_acctbal"), 2).alias("balance"),
                ).alias("account"),
            ).alias("customer"),
            _fround(F.col("o_totalprice"), 2).alias("total"),
        )
    )
    flat = flatten_struct(nested)
    return flat.filter(F.col("customer_account_balance") > 9000.0).select(
        "o_orderkey",
        "customer_name",
        "customer_segment",
        F.col("customer_account_nation").alias("nation"),
        "customer_account_balance",
        "total",
    )


def q_c4_boilerplate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (§2.10): chunk each document into
    10-token lines, drop ragged tails and lines where > 20% of tokens
    are single characters (C4's short-token boilerplate heuristic),
    then rebuild the document and drop docs left with < 2 lines. All
    higher-order array functions — explode + slice + filter run inside
    whole-stage codegen, no Python."""
    line_w = 10
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("toks") - 1) / line_w).cast("int"),
                ),
                lambda i: F.slice(F.col("toks"), i * line_w + 1, line_w),
            )
        ).alias("pos", "line"),
    )
    kept = chunks.filter(
        (F.size("line") == line_w)
        & (
            F.size(F.filter(F.col("line"), lambda t: F.length(t) <= 1))
            <= int(line_w * 0.2)
        )
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.flatten(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("pos", "line"))
                            ),
                            lambda s: s["line"],
                        )
                    ),
                )
            ).alias("clean_hash"),
        )
        .filter(F.col("n_lines_kept") >= 2)
        .select(
            "doc_id",
            F.col("n_lines_kept").cast("bigint").alias("n_lines_kept"),
            "clean_hash",
        )
    )


def q_cogrouped_pandas_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (§2.8): orders and events grouped on the
    same key arrive as PAIRED pandas frames per key — the Arrow surface
    for custom per-key merge logic (asof merges, per-key reconciliation)
    that neither side's groupBy can express alone. Money is summed as
    integer cents inside the group so the Python-side sum is
    order-independent."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"), "event_id"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        key = (
            left["key"].iloc[0] if len(left) else right["key"].iloc[0]
        )
        return pd.DataFrame(
            {
                "key": [key],
                "n_orders": [len(left)],
                "n_events": [len(right)],
                "spend": [float(left["cents"].sum()) / 100.0],
            }
        )

    n_parts = spark.sparkContext.defaultParallelism
    out = (
        o.repartition(n_parts, "key")
        .groupBy("key")
        .cogroup(ev.repartition(n_parts, "key").groupBy("key"))
        .applyInPandas(
            merge,
            "key BIGINT, n_orders BIGINT, n_events BIGINT, spend DOUBLE",
        )
    )
    return out


def q_arrow_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (§2.8): per-batch pyarrow compute without a pandas
    conversion — the lowest-overhead Python hook (zero-copy Arrow
    RecordBatches in and out). Computes per-doc token counts with
    pyarrow.compute, then aggregates per lang JVM-side."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )

    def count_tokens(batches):
        for b in batches:
            toks = pc.list_value_length(
                pc.split_pattern(b.column("text"), " ")
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), b.column("lang"), toks],
                names=["doc_id", "lang", "n_tokens"],
            )

    mapped = d.mapInArrow(
        count_tokens, "doc_id BIGINT, lang STRING, n_tokens INT"
    )
    return mapped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )


def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink (built into Spark 4): the third at-rest text
    format beside JSON and CSV — write orders as row-tagged XML, read
    back with an explicit schema, aggregate. Completes the
    delimited/markup ingest matrix the reference's JSON-only extractor
    lacked."""
    o = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="graft_xml_")
    o.select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    ).repartition(4).write.mode("overwrite").format("xml").option(
        "rootTag", "orders"
    ).option("rowTag", "order").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema("o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT")
        .load(path)
    )
    out = back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("total_cents"),
        F.min("o_orderkey").alias("first_key"),
    )
    return _reclaimed(out, path)


def q_fuzzy_dedup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (§2.10 entity-dedup shape): candidate
    pairs come only from equality blocks (nation + name prefix), then
    edit distance confirms — the blocking keeps the pair space linear
    instead of O(n²), which is the only way fuzzy dedup survives at
    corpus scale. levenshtein is evaluated JVM-side on the blocked
    pairs."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.substring("c_name", 1, 12).alias("blk"),
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    )
    close_pairs = pairs.filter(
        F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 2
    )
    return close_pairs.groupBy(F.col("a.c_nationkey").alias("nation")).agg(
        F.count("*").alias("n_fuzzy_pairs"),
        F.min(F.col("a.c_custkey")).alias("first_left"),
    )


def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics family (§2.6): discrete percentiles
    (percentile_disc picks an actual data value — deterministic, unlike
    interpolating percentile_cont at engine boundaries is), median, and
    extremes per event type."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS p90,
               min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY event_type
        """
    )


def q_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank (operators/graph.py) over the bipartite
    customer->supplier graph induced by lineitems: 5 join+aggregate
    rounds with lineage cuts every 2nd iteration. Value-oracled: the
    contribution sums are decimal-cast (order-independent), so the
    DuckDB oracle (oracles._pagerank_sql, the recurrence unrolled one
    CTE per iteration) reproduces the ranks bit-exactly; the numpy
    cross-check lives in tests/test_graph.py."""
    from aproximacion_1_etl_spark.operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, iterations=5)
    return (
        pr.filter(F.col("node") >= 1000000)
        .select(
            (F.col("node") - 1000000).alias("supplier"),
            _fround(F.col("rank") * 1e6, 2).alias("rank_ppm"),
        )
        .orderBy(F.col("rank_ppm").desc(), F.col("supplier"))
        .limit(20)
    )


def q_domain_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing (§2.10): rebalance the corpus toward a uniform
    per-language share by computing each language's keep-rate FROM the
    observed counts (rate = target/count, capped at 1), then applying
    it as a deterministic key-hash filter — the data-mixture step of
    training-set construction, with rates derived in-plan (one tiny
    aggregate broadcast back), not hand-configured. Stable across runs,
    partitionings, and engines."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_lang"))
    totals = counts.agg(
        F.sum("n_lang").alias("total"), F.count("*").alias("n_l")
    )
    rates = counts.join(F.broadcast(totals)).select(
        "lang",
        "n_lang",
        F.least(
            F.lit(1.0),
            (F.col("total").cast("double") / F.col("n_l"))
            / F.col("n_lang"),
        ).alias("rate"),
    )
    # Clamp the scaled threshold to 65535: for rate in [~0.999992, 1.0)
    # floor(rate*65536+0.5) = 65536, whose hex '10000' would be lpad-
    # truncated to '1000' and silently keep only ~1/16 of rows. Values
    # at the cap compare >= every 4-hex-digit prefix, i.e. keep-all.
    rates = rates.withColumn(
        "thr",
        F.when(F.col("rate") >= 1.0, F.lit("g")).otherwise(
            F.lower(
                F.lpad(
                    F.hex(
                        F.least(
                            F.lit(65535),
                            F.floor(
                                F.col("rate") * 65536.0 + F.lit(0.5)
                            ).cast("bigint"),
                        )
                    ),
                    4,
                    "0",
                )
            )
        ),
    )
    kept = d.join(F.broadcast(rates), "lang").filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
        < F.col("thr")
    )
    return kept.groupBy("lang").agg(
        F.max("n_lang").cast("bigint").alias("n_before"),
        F.count("*").alias("n_kept"),
        _fround(F.max("rate"), 4).alias("rate"),
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: SemDeDup-style semantic dedup over a TRAINED IVF codebook
    (k-means, sqrt(n) cells — codebook, plan literals, and per-row
    assignment cost all grow sub-linearly) with in-cell sign-LSH
    banding sized by derive_leaf_planes so the per-leaf pair work
    stays bounded as cells grow; keep-lowest-id within (cell, band)
    at cos>=0.4 (text/vector.py::semantic_dedup)."""
    from aproximacion_1_etl_spark.text.vector import (
        derive_leaf_planes,
        derive_n_centroids,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    nc = derive_n_centroids(n)
    # leaf target 8 (not the default 32) so the banded path engages
    # from the oracle SF upward — the code path the 100 TB posture
    # depends on is the one the value gate exercises
    return semantic_dedup(
        emb,
        threshold=0.4,
        centroids=_trained_codebook(spark, sf_dir),
        leaf_planes=derive_leaf_planes(n, nc, target_cell_size=8),
        leaf_tables=2,
    )


def q_lm_trigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 quality filter: per-doc mean log-prob under a corpus-
    trained per-language char-trigram LM, model + scoring in one plan
    (text/analysis.py::lm_trigram_score)."""
    from aproximacion_1_etl_spark.text.analysis import lm_trigram_score

    docs = load_table(spark, sf_dir, "documents")
    return lm_trigram_score(docs)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 retrieval: distributed BM25 top-10 per query-term set —
    in-plan index statistics, query-filtered before scoring
    (text/analysis.py::bm25_topk)."""
    from aproximacion_1_etl_spark.text.analysis import (
        BM25_QUERIES,
        bm25_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_QUERIES, k=10)


def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 tokenizer training: one BPE round — top adjacent char
    pairs, counted over DISTINCT words weighted by frequency (the
    Zipf trick that keeps the pair fan-out off the raw token stream;
    text/analysis.py::bpe_merge_pairs)."""
    from aproximacion_1_etl_spark.text.analysis import bpe_merge_pairs

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merge_pairs(docs, k=30)


def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 embedding compression: per-vector symmetric int8
    quantization with audit stats (checksum, saturation, reconstruction
    MSE) — the 4x memory cut for ANN candidate stages
    (text/vector.py::embedding_quantize_int8)."""
    from aproximacion_1_etl_spark.text.vector import embedding_quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_quantize_int8(emb)


_PQ_BOOKS_CACHE: dict[tuple, dict] = {}


def _trained_pq_books(spark: SparkSession, sf_dir: str) -> dict:
    """Train-once-per-corpus PQ codebooks (memoized on (sf_dir, parquet
    mtime) — same model-artifact reasoning as _trained_codebook)."""
    key = _artifact_key(sf_dir, "embeddings")
    books = _PQ_BOOKS_CACHE.get(key)
    if books is None:
        from aproximacion_1_etl_spark.text.vector import train_pq_codebooks

        emb = load_table(spark, sf_dir, "embeddings")
        books = train_pq_codebooks(emb, m=8, n_centroids=16, iterations=3)
        _PQ_BOOKS_CACHE[key] = books
    return books


def q_ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 ANN, product-quantization path: 8 trained sub-codebooks
    (one distributed pass per Lloyd iteration trains all subspaces),
    vectors encoded as 8 small ints, asymmetric-distance top-k scored
    through per-query lookup tables baked into the plan — the corpus
    scan touches codes, never float vectors
    (text/vector.py::train_pq_codebooks / ann_topk_pq)."""
    from aproximacion_1_etl_spark.text.vector import ann_topk_pq

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_pq(
        emb,
        query_ids=[0, 1, 2, 3, 4],
        books=_trained_pq_books(spark, sf_dir),
        k=10,
    )


def q_ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 ANN, IVF-PQ composition: trained coarse codebook restricts
    each query to nprobe cells; probed candidates are scored through
    their PQ codes only (ADC). One corpus projection computes cell +
    code; both model artifacts are the memoized trained codebooks
    (text/vector.py::ann_topk_ivfpq)."""
    from aproximacion_1_etl_spark.text.vector import ann_topk_ivfpq

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_ivfpq(
        emb,
        query_ids=[0, 1, 2, 3, 4],
        coarse=_trained_codebook(spark, sf_dir),
        books=_trained_pq_books(spark, sf_dir),
        k=10,
        nprobe=4,
    )


def q_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 incremental dedup: the daily-batch shape — only the NEW
    slice (doc_id % 4 = 0) is shingled/hashed, then banded-joined
    against the persisted corpus signature store (here built in-plan
    from the old slice; production appends each accepted batch's
    signatures). Returns LSH collisions with the minhash Jaccard
    estimate (text/dedup.py::incremental_minhash_dedup)."""
    from aproximacion_1_etl_spark.text.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 4 == 0)
    corpus_sigs = minhash_signatures(
        word_shingles(docs.filter(F.col("doc_id") % 4 != 0), distinct=False)
    )
    return incremental_minhash_dedup(new_batch, corpus_sigs)


_APPEND_CODEBOOK_CACHE: dict[tuple, dict[int, list[float]]] = {}


def _trained_append_codebook(
    spark: SparkSession, sf_dir: str
) -> dict[int, list[float]]:
    """Codebook trained on the HISTORICAL slice only (vec_id % 4 != 0)
    — 'yesterday's index', the artifact q_ivf_index_append appends
    today's batch into. Memoized on (sf_dir, parquet mtime) like every
    model artifact."""
    from aproximacion_1_etl_spark.text.vector import (
        derive_n_centroids,
        train_ivf_centroids,
    )

    key = _artifact_key(sf_dir, "embeddings")
    cb = _APPEND_CODEBOOK_CACHE.get(key)
    if cb is None:
        old = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % 4 != 0
        )
        cb = train_ivf_centroids(
            old, n_centroids=derive_n_centroids(old.count()), iterations=3
        )
        _APPEND_CODEBOOK_CACHE[key] = cb
    return cb


def q_ivf_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 incremental ANN index maintenance — the daily-batch shape
    the reference's re-ingest loop implies (app.py:142-147 re-ingests
    each day's data into standing tables): the codebook stays trained
    on the historical corpus; ONLY the new batch (vec_id % 4 == 0) is
    assigned (map-side literal-codebook argmin, the historical vectors
    are never re-scanned), per-cell populations merge into the
    persisted stats, and exact-integer flags report per-cell skew
    (hot) and corpus growth (retrain_due) so the retrain policy is a
    measured trigger, not a guess
    (text/vector.py::ivf_index_append)."""
    from aproximacion_1_etl_spark.text.vector import (
        ivf_assign_cells,
        ivf_index_append,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = _trained_append_codebook(spark, sf_dir)
    baseline = (
        ivf_assign_cells(emb.filter(F.col("vec_id") % 4 != 0), cb)
        .groupBy("cell")
        .agg(F.count("*").alias("n_baseline"))
    )
    return ivf_index_append(emb.filter(F.col("vec_id") % 4 == 0), cb, baseline)


def q_streaming_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + §2.10: ANN index maintenance AS A STREAM — the streaming
    sibling of ``ivf_index_append`` (same trio as batch/streaming
    incremental dedup and the batch/streaming profile): the per-cell
    stats store is seeded from the historical index once, then the new
    corpus slice arrives in two waves; foreachBatch assigns ONLY its
    wave to the existing codebook (map-side literal argmin — history
    never rescanned) and appends per-cell increments to the store.
    Per-batch cost is O(|wave| x cells x dim) + a |cells|-sized write;
    state is the |cells|-sized stats relation. The final report (cell
    populations + the exact-integer hot/retrain_due policy flags) must
    equal the one-shot batch append — same oracle SQL."""
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.text.vector import ivf_assign_cells

    cb = _trained_append_codebook(spark, sf_dir)
    n_cells = len(cb)
    emb = load_table(spark, sf_dir, "embeddings")
    hist = emb.filter(F.col("vec_id") % 4 != 0)
    new = emb.filter(F.col("vec_id") % 4 == 0)

    base = tempfile.mkdtemp(prefix="graft_siv_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_siv_")
    src = os.path.join(base, "src")
    store = os.path.join(base, "stats")

    def handle_batch(batch, batch_id: int) -> None:
        inc = (
            ivf_assign_cells(batch, cb)
            .groupBy("cell")
            .agg(F.count("*").cast("bigint").alias("n_new"))
        )
        inc.write.mode("append").parquet(store)

    try:
        # seed the persisted index stats from the historical slice
        # (the one-time cost the standing index already paid)
        baseline = (
            ivf_assign_cells(hist, cb)
            .groupBy("cell")
            .agg(F.count("*").cast("bigint").alias("n_baseline"))
        )
        baseline.write.parquet(os.path.join(base, "baseline"))

        new.filter(F.col("vec_id") % 8 == 0).coalesce(1).write.parquet(
            os.path.join(src, "w1")
        )
        new.filter(F.col("vec_id") % 8 == 4).coalesce(1).write.parquet(
            os.path.join(src, "w2")
        )
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        q = (
            spark.readStream.schema(
                "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

        from aproximacion_1_etl_spark.text.vector import (
            ivf_merge_cell_stats,
        )

        new_counts = (
            spark.read.parquet(store)
            .groupBy("cell")
            .agg(F.sum("n_new").cast("bigint").alias("n_new"))
        )
        out = ivf_merge_cell_stats(
            spark.read.parquet(os.path.join(base, "baseline")),
            new_counts,
            n_cells,
        )
        return _reclaimed(out, base, ckpt)
    finally:
        # _reclaimed removes on success; this covers mid-build failures
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def q_deletion_vector_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level deletes WITHOUT data-file rewrite: two composing
    delete_rows calls append keys to a per-version sidecar; the read
    path anti-joins the (broadcast) deletion vector at scan time
    (sources/versioned.py::delete_rows / read_snapshot_with_dv). At
    100 TB a 0.1% delete stays kilobytes of intent instead of
    terabytes of rewrite."""
    from aproximacion_1_etl_spark.sources.versioned import (
        delete_rows,
        read_snapshot_with_dv,
        write_snapshot,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="graft_dv_")
    path = base + "/orders_dv"
    write_snapshot(o, path)
    delete_rows(spark, path, "o_orderkey", "o_orderkey % 7 = 0")
    delete_rows(
        spark, path, "o_orderkey", "o_orderstatus = 'F' AND o_orderkey % 5 = 0"
    )
    out = (
        read_snapshot_with_dv(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            _dsum(F.col("o_totalprice")).alias("total"),
        )
    )
    return _reclaimed(out, base)


def q_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 hybrid retrieval: BM25 lexical top-20 and exact-cosine
    semantic top-20 per query, fused by reciprocal-rank fusion
    (text/analysis.py::rrf_fuse) into one top-10 — the standard RAG
    corpus-construction retrieval stack. Query ids double as both the
    BM25 term-set ids and the query vector ids (shared 0..n id space
    of documents/embeddings)."""
    from aproximacion_1_etl_spark.text.analysis import (
        BM25_QUERIES,
        bm25_topk,
        rrf_fuse,
    )
    from aproximacion_1_etl_spark.text.vector import ann_topk_bruteforce

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, BM25_QUERIES, k=20)
    sem = ann_topk_bruteforce(
        emb, query_ids=sorted(BM25_QUERIES), k=20, id_col="vec_id"
    ).withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse(lex, sem, k=10, rrf_k=60)


def q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 leakage-safe split: near-dup clusters (MinHash-LSH
    candidate pairs closed under transitivity) hash to ONE side of the
    train/val/test split, so no near-copy of a training doc can leak
    into eval (text/dedup.py::cluster_safe_split)."""
    from aproximacion_1_etl_spark.text.dedup import cluster_safe_split

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(word_shingles(docs, distinct=False))
    cands = minhash_candidate_pairs(sigs, min_matching_bands=2)
    return cluster_safe_split(
        docs, cands, {"train": 0.8, "val": 0.1, "test": 0.1}
    )


def q_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 index-quality gate: per-query recall@10 of the LSH
    approximate top-k vs the exact brute-force ground truth
    (text/vector.py::ann_recall_at_k) — the continuous measurement
    every approximate index needs."""
    from aproximacion_1_etl_spark.text.vector import ann_recall_at_k

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_recall_at_k(
        emb, query_ids=[0, 1, 2, 3, 4], k=10, planes=4, tables=2, dim=64
    )


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 tokenizer training: the full iterative BPE merge loop —
    8 rounds of count-pairs / pick-top / greedy-merge over the
    frequency-weighted distinct-word relation, returning the learned
    merge table (text/analysis.py::bpe_train_merges)."""
    from aproximacion_1_etl_spark.text.analysis import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_merges(docs, n_merges=8)


_BPE_MERGES_CACHE: dict[tuple, list[tuple[str, str]]] = {}


def _trained_bpe_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, str]]:
    """Train-once-per-corpus BPE merge table (memoized on (sf_dir,
    parquet mtime) — the tokenizer is a model artifact trained once and
    shipped to every consumer, same cost model as the IVF codebook).
    Exposed as a named builder so bench warmup can pre-build it with
    its own line item instead of charging training to the first
    encode-pass sample."""
    from aproximacion_1_etl_spark.text.analysis import bpe_train_merges

    key = _artifact_key(sf_dir, "documents")
    merges = _BPE_MERGES_CACHE.get(key)
    if merges is None:
        docs = load_table(spark, sf_dir, "documents")
        merges = [
            (r["p1"], r["p2"])
            for r in bpe_train_merges(docs, n_merges=8).collect()
        ]
        _BPE_MERGES_CACHE[key] = merges
    return merges


def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 tokenizer application: train the 8-rule BPE merge table
    (memoized — see _trained_bpe_merges), bake it into the plan as
    literals, and tokenize the corpus — per-doc token budgets for
    packing/context-length stages (text/analysis.py::bpe_encode)."""
    from aproximacion_1_etl_spark.text.analysis import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode(docs, _trained_bpe_merges(spark, sf_dir))


def q_training_batch_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 deterministic training-batch assignment: hash-order global
    index via two-phase distributed ranking (within-bucket rank +
    256-row offset window — NO single-task global sort window), cut
    into fixed-size batches (functions/sampling.py::
    pack_training_batches)."""
    from aproximacion_1_etl_spark.functions.sampling import (
        pack_training_batches,
    )

    docs = load_table(spark, sf_dir, "documents")
    return pack_training_batches(
        docs.select("doc_id", "lang"), "doc_id", batch_size=32
    )


def q_corpus_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 reproducibility primitive: order-insensitive Merkle-style
    corpus digest — (n_rows, fingerprint) changes iff any keyed row
    changes, built as bounded hex-prefix tree rollups (never one global
    collect; functions/profile.py::corpus_fingerprint)."""
    from aproximacion_1_etl_spark.functions.profile import (
        corpus_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")
    return corpus_fingerprint(
        docs, "doc_id", ["text", "lang", "source", "n_chars"]
    )


def q_fingerprint_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Merkle diff localization: compare the corpus against a
    deterministically mutated snapshot (doc 117 edited, doc 3 dropped)
    at the hex-prefix level — only disagreeing buckets surface, so two
    adjacent 100 TB snapshots compare by bucket digests, never row by
    row (functions/profile.py::fingerprint_diff)."""
    from aproximacion_1_etl_spark.functions.profile import (
        fingerprint_diff,
    )

    docs = load_table(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") != 3).withColumn(
        "text",
        F.when(F.col("doc_id") == 117, F.lit("tampered")).otherwise(
            F.col("text")
        ),
    )
    return fingerprint_diff(
        docs,
        mutated,
        "doc_id",
        ["text", "lang", "source", "n_chars"],
        prefix_len=2,
    )


def q_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 padding-efficient batching: band documents by token-count
    (64-wide buckets), then cut each band into deterministic
    hash-ordered batches via the per-band two-phase index — homogeneous
    batch lengths without any single-task ranking
    (functions/sampling.py::length_bucketed_batches)."""
    from aproximacion_1_etl_spark.functions.sampling import (
        length_bucketed_batches,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    return length_bucketed_batches(
        docs, "doc_id", "n_tokens", batch_size=16, bucket_width=64
    )


def q_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 exact-substring dedup signal: content-defined sampled
    40-char gram hashes grouped across the corpus — verbatim boilerplate
    and templated spans surface even when whole-doc MinHash misses them
    (text/dedup.py::repeated_substrings)."""
    from aproximacion_1_etl_spark.text.dedup import repeated_substrings

    docs = load_table(spark, sf_dir, "documents")
    return repeated_substrings(docs, gram_len=40, sample_prefix_lt="4")


def q_streaming_fingerprint_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.9 + §2.10: incremental Merkle maintenance AS A STREAM — the
    corpus arrives in two waves; foreachBatch appends the batch's
    (bucket, row-hash) rows to a prefix-partitioned store, recomputes
    digests ONLY for the buckets the batch touched (partition-pruned
    read; the store key is 'p'+prefix so partition type inference can
    never coerce hex dirs to ints), and publishes them latest-wins to a
    level log. Unchanged buckets are never re-read — per-batch cost is
    |batch| + |touched buckets|, the incremental-integrity topology at
    any corpus size. The final level relation is value-checked against
    the BATCH oracle (one digest pass over the whole corpus): any
    divergence in the maintenance path breaks hash parity."""
    import os
    import time as _time

    from pyspark.sql import Window

    from aproximacion_1_etl_spark.functions.profile import (
        row_bucket_hashes,
    )

    cols = ["text", "lang", "source", "n_chars"]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", *cols)
    base = tempfile.mkdtemp(prefix="graft_sfm_")
    src = os.path.join(base, "src")
    rows_store = os.path.join(base, "rows")
    level_log = os.path.join(base, "level")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "w1")
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "w2")
    )
    now = _time.time()
    for d, ts in (("w1", now - 120), ("w2", now - 60)):
        pdir = os.path.join(src, d)
        for f in os.listdir(pdir):
            os.utime(os.path.join(pdir, f), (ts, ts))

    def handle_batch(batch, batch_id: int) -> None:
        bh = row_bucket_hashes(batch, "doc_id", cols, prefix_len=2).select(
            F.concat(F.lit("p"), F.col("prefix")).alias("pfx"), "h"
        )
        bh.write.mode("append").partitionBy("pfx").parquet(rows_store)
        touched = [
            r["pfx"] for r in bh.select("pfx").distinct().collect()
        ]
        pruned = (
            batch.sparkSession.read.parquet(rows_store)
            .filter(F.col("pfx").isin(touched))
        )
        digests = pruned.groupBy("pfx").agg(
            F.sha2(
                F.concat_ws("", F.array_sort(F.collect_list("h"))), 256
            ).alias("digest"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
        digests.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(level_log)

    ckpt = tempfile.mkdtemp(prefix="ckpt_sfm_")
    q = (
        spark.readStream.schema(
            "doc_id BIGINT, text STRING, lang STRING, source STRING, "
            "n_chars BIGINT"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
        .writeStream.foreachBatch(handle_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    log = spark.read.parquet(level_log)
    w = Window.partitionBy("pfx").orderBy(F.col("batch_id").desc())
    out = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.substring("pfx", 2, 2).alias("prefix"), "digest", "n_rows"
        )
    )
    return _reclaimed(out, base, ckpt)


def q_temperature_mix_resample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 temperature-based mixture sampling (the mT5/XLM-R α-
    sampling rule): language l's target share ∝ p_l^α with α=0.5 —
    upweights low-resource languages without flattening to uniform.
    Keep-rates derive in-plan from observed counts; α=0.5 is computed
    with sqrt, which IEEE 754 requires to be correctly rounded, so the
    rate arithmetic is bit-identical across engines (general α uses
    pow; 0.5 is the bit-exactness-guaranteed case). Same clamped
    md5-threshold filter as domain_mix_resample."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_lang"))
    totals = counts.agg(
        F.sum("n_lang").alias("total"),
        F.sum(F.sqrt(F.col("n_lang").cast("double"))).alias("sum_sqrt"),
    )
    rates = counts.join(F.broadcast(totals)).select(
        "lang",
        "n_lang",
        F.least(
            F.lit(1.0),
            (
                F.sqrt(F.col("n_lang").cast("double"))
                / F.col("sum_sqrt")
                * F.col("total").cast("double")
            )
            / F.col("n_lang"),
        ).alias("rate"),
    )
    rates = rates.withColumn(
        "thr",
        F.when(F.col("rate") >= 1.0, F.lit("g")).otherwise(
            F.lower(
                F.lpad(
                    F.hex(
                        F.least(
                            F.lit(65535),
                            F.floor(
                                F.col("rate") * 65536.0 + F.lit(0.5)
                            ).cast("bigint"),
                        )
                    ),
                    4,
                    "0",
                )
            )
        ),
    )
    kept = d.join(F.broadcast(rates), "lang").filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
        < F.col("thr")
    )
    return kept.groupBy("lang").agg(
        F.max("n_lang").cast("bigint").alias("n_before"),
        F.count("*").alias("n_kept"),
        _fround(F.max("rate"), 4).alias("rate"),
    )


def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 contrastive-training data: per query vector, the top-k
    HIGH-similarity non-duplicate neighbors — cosine in [0.10, 0.95):
    the 0.95 cap excludes near-duplicates (false negatives that would
    poison the contrastive loss), the floor drops trivially unrelated
    vectors. Same broadcast nested-loop shape as exact ANN; the band
    filter is a narrow predicate on the scored relation."""
    from aproximacion_1_etl_spark.text.vector import (
        _as_double,
        _fround as _vr,
        cosine_sim,
    )
    from pyspark.sql import Window

    emb = _as_double(
        load_table(spark, sf_dir, "embeddings"), "embedding"
    )
    qids = [0, 1, 2, 3, 4]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pairs = emb.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        _vr(cosine_sim(F.col("qvec"), F.col("embedding")), 9).alias(
            "cos_sim"
        ),
    ).filter(
        (F.col("cos_sim") >= 0.10) & (F.col("cos_sim") < 0.95)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "vec_id",
            _vr(F.col("cos_sim"), 4).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 curation metric: per-doc novelty = fraction of its
    distinct word-3-grams that occur in NO other document. Novel-
    content selection is the inverse of dedup: sampling high-novelty
    docs raises corpus diversity per token. Shape: one shingle
    explode, a df count per shingle (shuffle on the high-cardinality
    shingle key), and a join back — the same key distribution as the
    MinHash pipeline, so skew behavior is identical."""
    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, n=3, distinct=True)
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    joined = sh.join(df_counts, "shingle")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_unique",
            _fround(
                F.col("n_unique").cast("double") / F.col("n_grams"), 4
            ).alias("novelty"),
        )
    )


def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 pipeline observability: how many documents survive each
    cleaning stage, as cumulative conjunctions computed in ONE scan —
    raw -> length band -> known language -> quality floor -> exact-
    content unique. The funnel is the report every corpus-construction
    run ships next to its output; stage predicates reuse the exact
    expressions of the cleaning operators so the counts cannot drift
    from the real pipeline."""
    from pyspark.sql import Window

    from aproximacion_1_etl_spark.text.analysis import (
        lang_id,
        quality_score,
    )
    from aproximacion_1_etl_spark.text.dedup import normalized

    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    w = Window.partitionBy(F.sha2(normalized(t), 256)).orderBy("doc_id")
    flags = d.select(
        (F.length(t) >= 100).alias("len_ok"),
        (lang_id(t) != "und").alias("lang_ok"),
        (quality_score(t) >= 0.5).alias("quality_ok"),
        (F.row_number().over(w) == 1).alias("first_of_content"),
    )
    agg = flags.agg(
        F.count("*").alias("raw"),
        F.sum(F.when(F.col("len_ok"), 1).otherwise(0)).alias("s1"),
        F.sum(
            F.when(F.col("len_ok") & F.col("lang_ok"), 1).otherwise(0)
        ).alias("s2"),
        F.sum(
            F.when(
                F.col("len_ok") & F.col("lang_ok") & F.col("quality_ok"), 1
            ).otherwise(0)
        ).alias("s3"),
        F.sum(
            F.when(
                F.col("len_ok")
                & F.col("lang_ok")
                & F.col("quality_ok")
                & F.col("first_of_content"),
                1,
            ).otherwise(0)
        ).alias("s4"),
    )
    return agg.select(
        F.expr(
            "stack(5, 'raw', raw, 'length_band', s1, 'known_lang', s2, "
            "'quality_floor', s3, 'content_unique', s4) "
            "AS (stage, n_docs)"
        )
    ).select("stage", F.col("n_docs").cast("bigint").alias("n_docs"))


def q_winnowed_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 winnowing (MOSS) fingerprint dedup: sliding-window minima
    over gram hashes — GUARANTEED detection of any verbatim span >=
    gram_len + window - 1 chars, vs the probabilistic mod-p sampling
    of repeated_substrings (text/dedup.py::winnowed_fingerprints)."""
    from aproximacion_1_etl_spark.text.dedup import winnowed_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnowed_fingerprints(docs, gram_len=30, window=8)


BLOCKLIST_DOMAINS = ["src3.example.com", "src7.example.com", "bad.example.org"]


def q_domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 URL/domain filtering (the C4/RefinedWeb source-blocklist
    stage): a host matches a rule iff the rule equals the host or any
    label-boundary SUFFIX of it ("example.com" blocks every
    subdomain) — string contains/endswith would false-positive on
    "notexample.com". The suffix chain is built per-row
    (split -> transform -> slice) and matched against the blocklist as
    PLAN LITERALS via array_intersect: fully narrow, zero shuffles,
    composes with the scan. For blocklists too large to inline,
    explode the same suffix chain and broadcast-join the rule table —
    identical semantics, one broadcast."""
    d = load_table(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    parts = F.split(host, "\\.")
    suffixes = F.transform(
        F.sequence(F.lit(0), F.size(parts) - 1),
        lambda i: F.concat_ws(
            ".", F.slice(parts, i + 1, F.size(parts) - i)
        ),
    )
    rules = F.array(*[F.lit(r) for r in sorted(BLOCKLIST_DOMAINS)])
    matched = F.array_sort(F.array_intersect(suffixes, rules))
    return d.select(
        "doc_id",
        host.alias("host"),
        (F.size(matched) > 0).alias("blocked"),
        F.when(
            F.size(matched) > 0, F.element_at(matched, 1)
        ).alias("matched_rule"),
    )


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 embedding normalization prep: per-DIMENSION corpus stats
    (mean/std/min/max) — what centering, whitening, and quantizer
    calibration consume. posexplode fans each vector into (dim, value)
    rows (x dim cost, the honest way to aggregate across vectors);
    sums are decimal-cast so mean and variance are order-independent,
    and std = sqrt(E[x^2] - mean^2) stays bit-identical cross-engine
    (sqrt is IEEE-correctly-rounded)."""
    from aproximacion_1_etl_spark.text.vector import _as_double

    e = _as_double(load_table(spark, sf_dir, "embeddings"), "embedding")
    ex = e.select(F.posexplode("embedding").alias("pos", "v"))
    agg = ex.groupBy((F.col("pos") + 1).alias("dim")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("v").cast("decimal(38,18)")).alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,18)")).alias("s2"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        _fround(mean, 6).alias("mean"),
        _fround(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std"),
        _fround(F.col("vmin"), 6).alias("vmin"),
        _fround(F.col("vmax"), 6).alias("vmax"),
    )


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 corpus statistics: vocabulary growth (Heaps-law) curve —
    per document (in doc_id order), how many word-3-grams are NEW and
    the cumulative distinct vocabulary so far. The curve's flattening
    is the classic "more of the same" saturation signal corpus
    curation watches. Shape: each gram's first-occurrence doc via one
    groupBy min, counts per first-doc, and a running sum over the
    per-doc relation (corpus-sized rows only in the first two keyed
    aggregations; the window runs over |docs| rows)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, n=3, distinct=True)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("new_grams")
    )
    spine = docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("new_grams", F.lit(0)).cast("bigint").alias("new_grams"),
    )
    # Two-phase running sum (same pattern as deterministic_global_index):
    # a bare ORDER BY doc_id window is one task over the whole corpus.
    # Bucket by doc_id ranges — order-aligned with doc_id, so
    # bucket-offset + in-bucket running sum == the global prefix sum —
    # and the offsets window runs over |docs|/65536 rows (re-apply the
    # same split once more if even that is too large).
    bucketed = spine.withColumn("b", F.expr("doc_id div 65536"))
    wb = Window.partitionBy("b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    inb = bucketed.withColumn("run_in_b", F.sum("new_grams").over(wb))
    wo = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        bucketed.groupBy("b")
        .agg(F.sum("new_grams").alias("nb"))
        .select("b", F.coalesce(F.sum("nb").over(wo), F.lit(0)).alias("off"))
    )
    return (
        inb.join(F.broadcast(off), "b")
        .select(
            "doc_id",
            "new_grams",
            (F.col("run_in_b") + F.col("off")).cast("bigint").alias(
                "cum_vocab"
            ),
        )
    )


def q_kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 clustering-quality report over the TRAINED IVF codebook:
    per cell — population, mean (6-dp) quantization distance, dominant
    label with its count. The go/no-go stats for every IVF/SemDeDup
    consumer: ballooning cells or rising mean distance mean the
    codebook no longer fits the corpus. Assignment is the same
    map-side codebook-literal argmin as ann_topk_ivf (no shuffle);
    the two keyed aggregations run over |corpus| and |cells x labels|
    rows. Mean distance sums in decimal so the report value-checks
    against the in-engine training recurrence oracle."""
    from pyspark.sql import Window

    from aproximacion_1_etl_spark.text.vector import (
        _as_double,
        _dist_structs_sql,
        _sql_dot,
    )

    emb = _as_double(load_table(spark, sf_dir, "embeddings"), "embedding")
    cents = _trained_codebook(spark, sf_dir)
    cdots = {cid: sum(x * x for x in v) for cid, v in cents.items()}
    spread = emb.repartition(
        emb.sparkSession.sparkContext.defaultParallelism, "vec_id"
    )
    with_vv = spread.withColumn(
        "_vv", F.expr(_sql_dot("embedding", "embedding"))
    )
    m = F.array_min(
        F.expr(_dist_structs_sql(cents, cdots, "embedding", "_vv", 6))
    )
    assigned = with_vv.select(
        "vec_id",
        "label",
        m.getField("cid").alias("cell"),
        m.getField("d").alias("d6"),
    )
    stats = assigned.groupBy("cell").agg(
        F.count("*").cast("bigint").alias("n"),
        (
            F.sum(F.col("d6").cast("decimal(38,18)")).cast("double")
            / F.count("*")
        ).alias("md"),
    )
    wl = Window.partitionBy("cell").orderBy(
        F.col("n_l").desc(), F.col("label").asc()
    )
    lbl = (
        assigned.groupBy("cell", "label")
        .agg(F.count("*").alias("n_l"))
        .withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select(
            "cell",
            F.col("label").alias("top_label"),
            F.col("n_l").cast("bigint").alias("top_label_n"),
        )
    )
    return stats.join(lbl, "cell").select(
        F.col("cell").cast("int").alias("cell"),
        "n",
        _fround(F.col("md"), 6).alias("mean_dist"),
        "top_label",
        "top_label_n",
    )


def q_ann_topk_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 multi-probe LSH (Lv et al.): probe the 1-bit-flip neighbor
    buckets of each query — table-count recall at single-table corpus
    cost; the fan-out is query-side only
    (text/vector.py::ann_topk_lsh_multiprobe)."""
    from aproximacion_1_etl_spark.text.vector import (
        ann_topk_lsh_multiprobe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_lsh_multiprobe(
        emb, query_ids=[0, 1, 2, 3, 4], k=10, planes=4, tables=1, dim=64
    )


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 classifier evaluation artifact: confusion matrix of the
    heuristic language-ID against the labeled ``lang`` column, with
    per-true-language recall — the calibration report any quality
    gate built on lang_id needs before filtering by it. One scan, one
    keyed aggregation."""
    from aproximacion_1_etl_spark.text.analysis import lang_id

    d = load_table(spark, sf_dir, "documents")
    cm = d.groupBy(
        F.col("lang").alias("true_lang"),
        lang_id(F.col("text")).alias("pred_lang"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = cm.groupBy("true_lang").agg(F.sum("n").alias("n_true"))
    return cm.join(tot, "true_lang").select(
        "true_lang",
        "pred_lang",
        "n",
        _fround(
            F.col("n").cast("double") / F.col("n_true"), 4
        ).alias("frac_of_true"),
    )


def q_quality_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 robust per-source outlier flagging: docs whose quality
    score sits more than 3 MAD-equivalents from their SOURCE's median
    — median/MAD instead of mean/std so a burst of junk cannot mask
    itself by inflating the std. Exact discrete percentiles
    (percentile_disc) keep both engines bit-identical; the per-source
    stats relation is tiny and broadcasts back."""
    from aproximacion_1_etl_spark.text.analysis import quality_score

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", quality_score(F.col("text")).alias("q")
    )
    med = d.groupBy("source").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY q)").alias(
            "med"
        )
    )
    dev = d.join(F.broadcast(med), "source").select(
        "doc_id", "source", "q", "med",
        F.abs(F.col("q") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("source").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)"
        ).alias("mad")
    )
    out = dev.join(F.broadcast(mad), "source").filter(
        F.col("adev") > 3.0 * F.greatest(F.col("mad"), F.lit(0.0001))
    )
    return out.select(
        "doc_id",
        "source",
        _fround(F.col("q"), 4).alias("q"),
        _fround(F.col("med"), 4).alias("source_median"),
        _fround(F.col("adev"), 4).alias("abs_dev"),
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


def q_event_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 behavioral pattern mining: corpus-wide counts of
    consecutive event-type transitions (per-user ts order) with their
    conditional probability P(next | prev) — the first-order Markov
    model of user flows. One window pass for the lag, two keyed
    aggregations; the transition matrix is |types|^2-bounded."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    cm = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = cm.groupBy("prev_type").agg(F.sum("n").alias("n_prev"))
    return cm.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        _fround(F.col("n").cast("double") / F.col("n_prev"), 4).alias(
            "p_next_given_prev"
        ),
    )


def q_rerank_crossencoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 + §2.10 retrieve -> rerank: the hybrid RRF top-10 per query
    is joined back to document text and re-scored by an Arrow-batched
    pandas UDF standing in for a cross-encoder — the two-stage ranking
    stack every production RAG system runs (cheap recall stage, then
    an expensive pairwise model over k rows per query, NEVER the
    corpus). The stand-in model is a deterministic md5 over
    (query_id, doc_id, text prefix), so the full pipeline — retrieval,
    join, Arrow round-trip, rerank window — is value-checked
    end-to-end; swap the UDF body for a real model and the plumbing
    (batch shape, join, ranking) is already proven."""
    from aproximacion_1_etl_spark.operators.pandas_ops import ce_key_udf
    from aproximacion_1_etl_spark.text.analysis import (
        BM25_QUERIES,
        bm25_topk,
        rrf_fuse,
    )
    from aproximacion_1_etl_spark.text.vector import ann_topk_bruteforce

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, BM25_QUERIES, k=20)
    sem = ann_topk_bruteforce(
        emb, query_ids=sorted(BM25_QUERIES), k=20, id_col="vec_id"
    ).withColumnRenamed("vec_id", "doc_id")
    fused = rrf_fuse(lex, sem, k=10, rrf_k=60)
    ce_key = ce_key_udf()
    joined = fused.join(
        docs.select("doc_id", "text"), "doc_id", "left"
    ).select(
        "query_id",
        "doc_id",
        ce_key(F.col("query_id"), F.col("doc_id"), F.col("text")).alias(
            "ce_key"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ce_key").desc(), F.col("doc_id").asc()
    )
    return joined.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    )


def q_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 association mining (market-basket over user baskets):
    unordered event-type pairs co-occurring within a user's history,
    with support and lift = P(a,b) / (P(a) P(b)). The basket relation
    is per-user DISTINCT types (bounded by |types| per user, built
    with one keyed agg); pairs come from a per-row array-combination
    expression — no self-join of the event table. Counts are exact;
    lift is two double divisions of exact integers, floor-rounded to 4,
    so the key value-checks."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    n_users = baskets.agg(F.count("*").alias("n_users"))
    pairs = baskets.select(
        "user_id",
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("types"),
                        lambda a: F.transform(
                            F.col("types"),
                            lambda b: F.struct(
                                a.alias("type_a"), b.alias("type_b")
                            ),
                        ),
                    )
                ),
                lambda st: st["type_a"] < st["type_b"],
            )
        ).alias("pr"),
    ).select("user_id", "pr.type_a", "pr.type_b")
    pc = pairs.groupBy("type_a", "type_b").agg(
        F.count("*").cast("bigint").alias("n_both")
    )
    single = baskets.select(
        "user_id", F.explode("types").alias("t")
    ).groupBy("t").agg(F.count("*").alias("n_t"))
    sa = single.select(F.col("t").alias("type_a"), F.col("n_t").alias("n_a"))
    sb = single.select(F.col("t").alias("type_b"), F.col("n_t").alias("n_b"))
    return (
        pc.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_both",
            _fround(
                F.col("n_both").cast("double") / F.col("n_users"), 4
            ).alias("support"),
            _fround(
                (F.col("n_both").cast("double") / F.col("n_users"))
                / (
                    (F.col("n_a").cast("double") / F.col("n_users"))
                    * (F.col("n_b").cast("double") / F.col("n_users"))
                ),
                4,
            ).alias("lift"),
        )
    )


def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 dedup observability: per source — document count, docs
    that are exact-content duplicates (normalized-hash group size > 1),
    and docs swept into a near-dup cluster as non-keepers. The
    per-source attribution is what turns a dedup pass into an
    actionable report (which feed is flooding the corpus with copies).
    Reuses the exact operators' expressions and the MinHash-LSH
    cluster pipeline, so the report cannot drift from the real dedup
    decisions."""
    from pyspark.sql import Window

    from aproximacion_1_etl_spark.text.dedup import normalized

    d = load_table(spark, sf_dir, "documents")
    wch = Window.partitionBy(F.sha2(normalized(F.col("text")), 256))
    flags = d.select(
        "doc_id",
        "source",
        (F.count("*").over(wch) > 1).alias("is_exact_dup"),
    )
    sigs = minhash_signatures(word_shingles(d, distinct=False))
    cands = minhash_candidate_pairs(sigs, min_matching_bands=2)
    dropped = dedup_clusters(cands).filter(~F.col("keep")).select(
        "doc_id", F.lit(True).alias("is_near_dup_drop")
    )
    joined = flags.join(F.broadcast(dropped), "doc_id", "left")
    return joined.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_exact_dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact_dup"),
        F.sum(
            F.when(F.coalesce("is_near_dup_drop", F.lit(False)), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_near_dup_dropped"),
    )


def q_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 capstone composite — the corpus RELEASE job end-to-end in
    one plan: quality gate (length band, known language, quality
    floor), exact-content dedup (keep first), leakage-safe
    cluster-aware train/val/test split over the survivors, and the
    per-split manifest (docs / whitespace tokens / chars) a training
    run consumes. Every stage reuses the production operator
    expressions, so the release manifest value-checks against the
    composed oracle end-to-end."""
    from pyspark.sql import Window

    from aproximacion_1_etl_spark.text.analysis import (
        lang_id,
        quality_score,
        token_count,
    )
    from aproximacion_1_etl_spark.text.dedup import (
        cluster_safe_split,
        normalized,
    )

    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    wch = Window.partitionBy(F.sha2(normalized(t), 256)).orderBy("doc_id")
    clean = (
        d.withColumn("rn", F.row_number().over(wch))
        .filter(
            (F.length(t) >= 100)
            & (lang_id(t) != "und")
            & (quality_score(t) >= 0.5)
            & (F.col("rn") == 1)
        )
        .drop("rn")
    )
    # materialize the cleaned corpus once: the shingle/split branch
    # and the final manifest join otherwise each replay the quality
    # gate + content-hash dedup window (a real release job writes the
    # cleaned corpus at this point anyway)
    clean = clean.localCheckpoint()
    sigs = minhash_signatures(word_shingles(clean, distinct=False))
    cands = minhash_candidate_pairs(sigs, min_matching_bands=2)
    split = cluster_safe_split(
        clean, cands, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")
    return (
        clean.join(split, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(token_count(t).cast("bigint"))
            .cast("bigint")
            .alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


def q_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 embedding whitening prep: top principal component via
    distributed Gram accumulation + driver power iteration
    (text/vector.py::pca_top_component). One corpus pass, O(dim^2)
    exchange, bounded dim x dim collect (the Gram IS the model)."""
    from aproximacion_1_etl_spark.text.vector import pca_top_component

    return pca_top_component(load_table(spark, sf_dir, "embeddings"))


def q_ols_event_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 distributed closed-form OLS: fit value ~ 1 + hour + dow
    over events via normal equations — X'X and X'y accumulate in ONE
    aggregation (map-side combine; integer feature moments are exact,
    the y-moments are order-independent decimal sums), then Cramer's
    rule solves the 3x3 system IN-PLAN on the single aggregated row
    (no collect, no driver arithmetic). The same spelled-out
    determinant expressions run in DuckDB, so weights, R^2 and RMSE
    are engine-identical IEEE double arithmetic. The pattern is the
    scalable skeleton for any fixed-width linear model at 100 TB: one
    shuffle of a handful of scalars, whatever the row count.

    dow is computed as days-since-Monday-epoch mod 7 (1970-01-05), the
    only dow definition both engines spell identically."""
    ev = load_table(spark, sf_dir, "events")
    feat = ev.select(
        F.col("value").alias("y"),
        F.hour("ts").cast("bigint").alias("h"),
        F.pmod(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-05")), F.lit(7)
        )
        .cast("bigint")
        .alias("d"),
    )
    agg = feat.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("h").alias("sh"),
        F.sum("d").alias("sd"),
        F.sum(F.col("h") * F.col("h")).alias("shh"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("h") * F.col("d")).alias("shd"),
        F.sum(F.col("y").cast("decimal(38,18)")).alias("sy"),
        F.sum((F.col("y") * F.col("h")).cast("decimal(38,18)")).alias("shy"),
        F.sum((F.col("y") * F.col("d")).cast("decimal(38,18)")).alias("sdy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,18)")).alias("syy"),
    )
    # identical det3 structure in the oracle: a*(e*i - f*h)
    # - b*(d*i - f*g) + c*(d*h - e*g)
    expr = """
      CAST(n AS DOUBLE) AS nd, CAST(sh AS DOUBLE) AS shd_,
      CAST(sd AS DOUBLE) AS sdd_, CAST(shh AS DOUBLE) AS shhd,
      CAST(sdd AS DOUBLE) AS sddd, CAST(shd AS DOUBLE) AS shdd,
      CAST(sy AS DOUBLE) AS syd, CAST(shy AS DOUBLE) AS shyd,
      CAST(sdy AS DOUBLE) AS sdyd, CAST(syy AS DOUBLE) AS syyd
    """
    m = agg.selectExpr("n", *[e.strip() for e in expr.strip().split(",")])
    det = (
        "(nd*(shhd*sddd - shdd*shdd) - shd_*(shd_*sddd - shdd*sdd_)"
        " + sdd_*(shd_*shdd - shhd*sdd_))"
    )
    det0 = (
        "(syd*(shhd*sddd - shdd*shdd) - shd_*(shyd*sddd - shdd*sdyd)"
        " + sdd_*(shyd*shdd - shhd*sdyd))"
    )
    det1 = (
        "(nd*(shyd*sddd - shdd*sdyd) - syd*(shd_*sddd - shdd*sdd_)"
        " + sdd_*(shd_*sdyd - shyd*sdd_))"
    )
    det2 = (
        "(nd*(shhd*sdyd - shyd*shdd) - shd_*(shd_*sdyd - shyd*sdd_)"
        " + syd*(shd_*shdd - shhd*sdd_))"
    )
    sol = m.selectExpr(
        "n",
        "syd",
        "shyd",
        "sdyd",
        "syyd",
        "nd",
        f"{det0} / {det} AS w0",
        f"{det1} / {det} AS w1",
        f"{det2} / {det} AS w2",
    )
    # Spark SQL parses a bare 1000000.0 literal as DECIMAL, and
    # bigint-from-floor / decimal yields DECIMAL output — cast the
    # scale factors explicitly so the schema stays DOUBLE like the
    # oracle's.
    d6 = "CAST(1000000 AS DOUBLE)"
    d4 = "CAST(10000 AS DOUBLE)"
    return sol.selectExpr(
        "n",
        f"floor(w0 * {d6} + 0.5) / {d6} AS w_intercept",
        f"floor(w1 * {d6} + 0.5) / {d6} AS w_hour",
        f"floor(w2 * {d6} + 0.5) / {d6} AS w_dow",
        "floor((1.0 - (syyd - w0*syd - w1*shyd - w2*sdyd)"
        f" / (syyd - syd*syd/nd)) * {d6} + 0.5) / {d6} AS r2",
        "floor(sqrt((syyd - w0*syd - w1*shyd - w2*sdyd) / nd)"
        f" * {d4} + 0.5) / {d4} AS rmse",
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 privacy gate for data release: k-anonymity suppression
    over customer quasi-identifiers (segment, nation). Any QI
    combination seen by fewer than k=10 rows has its
    identifiers replaced by '*' and merged into the residual cell —
    the release never exposes a group an attacker could narrow below
    k. One window count + one keyed aggregation; both scale as plain
    hash aggregations (the QI cardinality bounds the state, not the
    row count)."""
    cust = load_table(spark, sf_dir, "customer")
    k = 10
    qi = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("string").alias("nat"),
    )
    counted = qi.withColumn(
        "grp_n", F.count("*").over(Window.partitionBy("seg", "nat"))
    )
    masked = counted.select(
        F.when(F.col("grp_n") >= k, F.col("seg")).otherwise("*").alias(
            "segment"
        ),
        F.when(F.col("grp_n") >= k, F.col("nat")).otherwise("*").alias(
            "nation"
        ),
    )
    return masked.groupBy("segment", "nation").agg(
        F.count("*").cast("bigint").alias("n_rows")
    )


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 entity resolution: Fellegi-Sunter-style scored record
    linkage customer <-> supplier. Blocking on nationkey keeps the
    candidate space at sum_n |C_n| x |S_n| instead of |C| x |S| (the
    classic all-pairs killer); the supplier side is dimension-sized
    and broadcast, so the block join is shuffle-free on the big side.
    Field comparators (balance proximity, name-number congruences)
    add exact-literal agreement/disagreement weights; top-1 match per
    customer above threshold via a ranked window with a deterministic
    tiebreak."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nk"),
        "c_acctbal",
        F.regexp_extract("c_name", r"(\d+)", 1).cast("bigint").alias("cnum"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_nationkey").alias("nk"),
        "s_acctbal",
        F.regexp_extract("s_name", r"(\d+)", 1).cast("bigint").alias("snum"),
    )
    pairs = cust.join(F.broadcast(supp), "nk")
    score = (
        F.when(F.abs(F.col("c_acctbal") - F.col("s_acctbal")) < 500, F.lit(2.5))
        .otherwise(F.lit(-0.5))
        + F.when(F.col("cnum") % 10 == F.col("snum") % 10, F.lit(1.5))
        .otherwise(F.lit(-0.3))
        + F.when(F.col("cnum") % 7 == F.col("snum") % 7, F.lit(1.0))
        .otherwise(F.lit(-0.2))
    )
    scored = pairs.select(
        "c_custkey", "s_suppkey", score.alias("score")
    ).filter(F.col("score") >= 3.0)
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("score").desc(), F.col("s_suppkey").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            "s_suppkey",
            _fround(F.col("score"), 1).alias("score"),
        )
    )


def q_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 mixture planning: allocate a total token budget (50% of
    the corpus) across sources by sqrt-weighted shares with one
    waterfill redistribution round — small sources are upweighted
    (sqrt flattening), no source is asked for more tokens than it
    has, and budget freed by capped sources flows to the others in
    proportion to headroom. Complements domain_mix_resample /
    temperature_mix_resample (which SAMPLE) by producing the PLAN
    (per-source allocations + epoch factors) a run config consumes.

    Shape: one corpus aggregation to |sources| rows, then scalar
    arithmetic on broadcast 1-row aggregates of that tiny relation —
    at 100 TB the only data-sized work is the first token count.
    Allocations snap to 6 decimals before the final floor so the
    cross-engine 1e-15 decimal-cast jitter can't flip an integer
    boundary."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("bigint")
        .alias("tokens")
    )
    # All corpus-wide scalars come from WINDOWS over the tiny
    # per-source relation, not crossJoin-of-aggregates: each
    # crossJoin(agg(per)) re-derives `per` — and with it the corpus
    # scan — once per reference (the first cut of this query scanned
    # documents 4x / 7 exchanges; this shape scans once / 2). The
    # unpartitioned window moves |sources| rows to one task — bounded
    # by the source count, not the corpus.
    w0 = Window.partitionBy()
    staged = per.select(
        "source",
        "tokens",
        (
            F.sum("tokens").over(w0) - (F.sum("tokens").over(w0) % 2)
        ).alias("b2"),
        F.sqrt(F.col("tokens").cast("double")).alias("sq"),
        F.sum(
            F.sqrt(F.col("tokens").cast("double")).cast("decimal(38,18)")
        )
        .over(w0)
        .cast("double")
        .alias("sum_sqrt"),
    )
    first = staged.select(
        "source",
        "tokens",
        "b2",
        F.least(
            F.col("tokens").cast("double"),
            F.col("sq") / F.col("sum_sqrt") * (F.col("b2") / 2),
        ).alias("alloc1"),
    ).withColumn(
        "headroom", F.col("tokens").cast("double") - F.col("alloc1")
    )
    redo = first.select(
        "source",
        "tokens",
        "b2",
        "alloc1",
        "headroom",
        F.sum(F.col("alloc1").cast("decimal(38,18)"))
        .over(w0)
        .cast("double")
        .alias("sum_a1"),
        F.sum(F.col("headroom").cast("decimal(38,18)"))
        .over(w0)
        .cast("double")
        .alias("sum_hr"),
    )
    final = redo.select(
        "source",
        "tokens",
        F.least(
            F.col("tokens").cast("double"),
            F.col("alloc1")
            + (F.col("b2") / 2 - F.col("sum_a1"))
            * F.col("headroom")
            / F.col("sum_hr"),
        ).alias("alloc2"),
    )
    return final.select(
        "source",
        "tokens",
        F.floor(
            F.floor(F.col("alloc2") * 1e6 + F.lit(0.5)) / F.lit(1e6)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
        _fround(
            F.floor(F.floor(F.col("alloc2") * 1e6 + F.lit(0.5)) / F.lit(1e6))
            / F.col("tokens").cast("double"),
            6,
        ).alias("epochs"),
    )


def q_triangle_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 graph analytics: triangle participation counts over the
    part co-order graph (parts are linked when they appear in the same
    order), top-20 parts. Uses the degree-ordered node-iterator
    (operators/graph.py::count_triangles) so wedge enumeration is
    bounded at hubs; the DuckDB oracle runs the orientation-free a<b
    formulation — identical counts, which is itself a check that the
    degree-ordering optimization is semantics-preserving."""
    from aproximacion_1_etl_spark.operators.graph import count_triangles

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # Edges WITHOUT a fact-table self-join: group parts per order and
    # emit the pairwise combinations map-side (order baskets are
    # small, so the fan-out is bounded; one orderkey shuffle replaces
    # the self-join's two). The explicit repartition keeps the basket
    # aggregation wide under byte-based AQE coalescing.
    per_order = (
        li.repartition(
            spark.sparkContext.defaultParallelism, F.col("l_orderkey")
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    edges = per_order.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ps"), i + F.lit(2), F.size(F.col("ps"))
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("e")
    ).select("e.a", "e.b")
    counts = count_triangles(edges)
    w = Window.orderBy(F.col("n_triangles").desc(), F.col("node").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            F.col("node").alias("l_partkey"),
            "n_triangles",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def q_quantile_normalize_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 cross-source score calibration: quantile normalization —
    each document's within-source quantile is mapped to the GLOBAL
    score at that quantile, so sources whose quality scorer runs hot
    or cold become comparable before mixing/filtering (the tabular
    cousin of batch-effect normalization).

    The global ranking deliberately avoids the single-task global
    window: scores bucket onto a fixed 1000-cell grid (map-side),
    per-bucket counts prefix-sum on the |grid|-sized relation, and
    each doc's global rank = bucket offset + within-bucket rank — the
    vocab_growth two-phase pattern, so the only corpus-sized windows
    are per-bucket/per-source partitions, never ORDER BY over
    everything. The quantile lookup is an integer-index equi-join
    back onto the ranked relation.

    Ranks use the strict (score, doc_id) total order on both engines;
    the q -> index arithmetic is the same IEEE expression, and a
    single-doc source pins q = 0.5."""
    from aproximacion_1_etl_spark.text.analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    sc = docs.select(
        "doc_id", "source", quality_score(F.col("text")).alias("score")
    )
    bucketed = sc.withColumn(
        "bkt", F.floor(F.col("score") * 1000).cast("int")
    )
    bcounts = bucketed.groupBy("bkt").agg(F.count("*").alias("bn"))
    boff = bcounts.select(
        "bkt",
        (
            F.sum("bn").over(
                Window.orderBy("bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("off"),
    ).fillna({"off": 0})
    wb = Window.partitionBy("bkt").orderBy("score", "doc_id")
    ranked = (
        bucketed.withColumn("rb", F.row_number().over(wb))
        .join(boff, "bkt")
        .select(
            "doc_id",
            "source",
            "score",
            (F.col("off") + F.col("rb")).alias("grank"),
        )
    )
    n_total = sc.agg(F.count("*").alias("n_g"))
    ws = Window.partitionBy("source").orderBy("score", "doc_id")
    src_ranked = sc.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(ws).alias("rs"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    q = F.when(F.col("ns") == 1, F.lit(0.5)).otherwise(
        (F.col("rs") - F.lit(1)).cast("double")
        / (F.col("ns") - F.lit(1)).cast("double")
    )
    targeted = src_ranked.crossJoin(F.broadcast(n_total)).select(
        "doc_id",
        "source",
        "score",
        (
            F.floor(q * (F.col("n_g") - F.lit(1)).cast("double") + F.lit(0.5))
            + F.lit(1)
        )
        .cast("bigint")
        .alias("ti"),
    )
    lookup = ranked.select(
        F.col("grank").alias("ti"), F.col("score").alias("norm_score")
    )
    return targeted.join(lookup, "ti").select(
        "doc_id",
        "source",
        _fround(F.col("score"), 4).alias("score"),
        _fround(F.col("norm_score"), 4).alias("norm_score"),
    )


def q_logreg_label_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 iterative model fitting: full-batch gradient-descent
    logistic regression (operators/ml.py::logistic_regression_gd)
    predicting label < 5 from the first three embedding dimensions —
    the general pattern for ANY differentiable fixed-width model: one
    distributed aggregation per iteration, weights driver-held and
    9-dp-snapped so the DuckDB oracle replays the identical recurrence
    as unrolled CTEs. The final scoring pass emits weights, accuracy
    (decided on z >= 0 — exact arithmetic, no exp at the boundary) and
    logloss in ONE more aggregation."""
    from aproximacion_1_etl_spark.operators.ml import (
        logistic_regression_gd,
    )
    from aproximacion_1_etl_spark.text.vector import _as_double

    emb = _as_double(load_table(spark, sf_dir, "embeddings"), "embedding")
    feats = emb.select(
        F.when(F.col("label") < 5, 1.0).otherwise(0.0).alias("y"),
        F.element_at("embedding", 1).alias("x1"),
        F.element_at("embedding", 2).alias("x2"),
        F.element_at("embedding", 3).alias("x3"),
    )
    w = logistic_regression_gd(
        feats, ["x1", "x2", "x3"], label_col="y", iterations=12, lr=2.0
    )
    z = (
        F.lit(0.0)
        + F.lit(w[0]) * F.lit(1.0)
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )
    correct = (
        (z >= 0) == (F.col("y") == 1.0)
    ).cast("int")
    ll = F.log(F.lit(1.0) + F.exp(-z)) + (F.lit(1.0) - F.col("y")) * z
    out = feats.select(
        "y", correct.alias("correct_i"), ll.alias("ll_i")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        (
            F.sum(F.col("correct_i")).cast("double") / F.count("*")
        ).alias("acc_raw"),
        (
            F.sum(F.col("ll_i").cast("decimal(38,18)")).cast("double")
            / F.count("*")
        ).alias("ll_raw"),
    )
    return out.select(
        "n",
        *[
            _fround(F.lit(w[j]), 6).alias(f"w{j}")
            for j in range(4)
        ],
        _fround(F.col("acc_raw"), 4).alias("accuracy"),
        _fround(F.col("ll_raw"), 4).alias("logloss"),
    )


def q_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 trained text classification: multinomial Naive Bayes over
    whitespace tokens, trained AND applied in one logical plan
    (resubstitution eval), emitting the confusion matrix — the trained
    complement of the heuristic lang_confusion key.

    score(d, l) = ln(prior_l) - |d| * ln(t_l + V)
                + sum_{tok in d} ln(c_{l,tok} + 1)

    The absent-token smoothing term ln(1) = 0 vanishes, so the
    per-(doc, lang) sum needs ONLY the inner join of doc-token
    instances with the present (lang, tok) counts — no dense
    vocab x lang grid ever materializes; the doc x lang score grid
    (|docs| x |langs|) comes from a broadcast join with the 5-row
    language stats. Decimal-cast sums of per-instance ln values keep
    scores order-independent; ranking rounds to 9 dp so sub-ulp ln()
    differences between engines can't flip the argmax."""
    docs = load_table(spark, sf_dir, "documents")
    dp = spark.sparkContext.defaultParallelism
    toks = (
        docs.repartition(dp, F.col("doc_id"))
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode(
                F.split(F.lower(F.trim("text")), r"\s+")
            ).alias("tok"),
        )
        .filter(F.length("tok") > 0)
    )
    # ONE tokenization pass: model, per-doc token counts and the
    # scoring join all read the materialized token relation — without
    # the cut the explode replays once per branch (14 scans audited;
    # re-tokenizing a 100 TB corpus three times is the bm25-class
    # mistake this engine already fixed once).
    toks = toks.localCheckpoint()
    model = toks.groupBy(
        F.col("true_lang").alias("l"), "tok"
    ).agg(F.count("*").alias("c"))
    lang_tot = model.groupBy("l").agg(F.sum("c").alias("t"))
    vocab = model.select("tok").distinct().agg(
        F.count("*").alias("v")
    )
    priors = docs.groupBy(F.col("lang").alias("l")).agg(
        F.count("*").alias("nd")
    )
    n_docs = docs.agg(F.count("*").alias("n_all"))
    lstats = (
        lang_tot.join(priors, "l")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "l",
            (
                F.log(F.col("nd").cast("double") / F.col("n_all"))
            ).alias("lprior"),
            F.log((F.col("t") + F.col("v")).cast("double")).alias(
                "ldenom"
            ),
        )
    )
    ntok = toks.groupBy("doc_id", "true_lang").agg(
        F.count("*").alias("nt")
    )
    ssum = (
        toks.join(model, "tok")
        .groupBy("doc_id", "l")
        .agg(
            F.sum(
                F.log((F.col("c") + F.lit(1)).cast("double")).cast(
                    "decimal(38,18)"
                )
            )
            .cast("double")
            .alias("s")
        )
    )
    grid = ntok.crossJoin(F.broadcast(lstats))
    scored = grid.join(ssum, ["doc_id", "l"], "left").select(
        "doc_id",
        "true_lang",
        "l",
        _fround(
            F.col("lprior")
            - F.col("nt").cast("double") * F.col("ldenom")
            + F.coalesce(F.col("s"), F.lit(0.0)),
            9,
        ).alias("score"),
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("l").asc()
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("l").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("bigint").alias("n")
    )


def q_chi2_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 feature selection: per-language top-10 tokens by
    chi-square association between token document-frequency and
    language — what a quality/domain classifier build selects features
    with. All contingency cells are exact integer counts from two
    keyed aggregations over the distinct doc-token relation; the chi2
    formula is the same IEEE double expression on both engines. A
    min-df floor (>= 5 docs) drops the long tail before ranking."""
    docs = load_table(spark, sf_dir, "documents")
    dp = spark.sparkContext.defaultParallelism
    dtok = (
        docs.repartition(dp, F.col("doc_id"))
        .select(
            "doc_id",
            F.col("lang").alias("l"),
            F.explode(
                F.split(F.lower(F.trim("text")), r"\s+")
            ).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .distinct()
    )
    a_df = dtok.groupBy("l", "tok").agg(F.count("*").alias("a"))
    t_df = a_df.groupBy("tok").agg(F.sum("a").alias("df_t"))
    n_l = docs.groupBy(F.col("lang").alias("l")).agg(
        F.count("*").alias("nl")
    )
    n_all = docs.agg(F.count("*").alias("n_all"))
    cells = (
        a_df.join(t_df, "tok")
        .filter(F.col("df_t") >= 5)
        .join(F.broadcast(n_l), "l")
        .crossJoin(F.broadcast(n_all))
        .select(
            "l",
            "tok",
            F.col("a").cast("double").alias("ad"),
            (F.col("df_t") - F.col("a")).cast("double").alias("bd"),
            (F.col("nl") - F.col("a")).cast("double").alias("cd"),
            (
                F.col("n_all") - F.col("nl") - F.col("df_t") + F.col("a")
            )
            .cast("double")
            .alias("dd"),
            F.col("n_all").cast("double").alias("nn"),
            F.col("a").cast("bigint").alias("df_in_lang"),
        )
    )
    num = (
        F.col("ad") * F.col("dd") - F.col("bd") * F.col("cd")
    )
    chi2 = (
        F.col("nn")
        * num
        * num
        / (
            (F.col("ad") + F.col("bd"))
            * (F.col("cd") + F.col("dd"))
            * (F.col("ad") + F.col("cd"))
            * (F.col("bd") + F.col("dd"))
        )
    )
    ranked = cells.select(
        "l", "tok", "df_in_lang", _fround(chi2, 4).alias("chi2")
    )
    wl = Window.partitionBy("l").orderBy(
        F.col("chi2").desc(), F.col("tok").asc()
    )
    return (
        ranked.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") <= 10)
        .select(
            F.col("l").alias("lang"),
            "tok",
            "df_in_lang",
            "chi2",
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


def q_item_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 item-item collaborative filtering: top-5 co-order
    neighbors per part by cosine over basket co-occurrence
    (sim = c_ab / sqrt(c_a * c_b)) with a support floor — the classic
    Amazon-style recommender build. Pairs are generated map-side from
    per-order baskets (never a fact self-join, same shape as
    triangle_cooccurrence); the pair relation is symmetrized by a
    cheap union, so each part ranks all its neighbors. Item counts
    are |parts|-sized and broadcast onto the pair relation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    per_order = (
        li.repartition(
            spark.sparkContext.defaultParallelism, F.col("l_orderkey")
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    pairs = per_order.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ps"), i + F.lit(2), F.size(F.col("ps"))
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("e")
    ).select("e.a", "e.b")
    cab = pairs.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    item_n = per_order.select(
        F.explode("ps").alias("p")
    ).groupBy("p").agg(F.count("*").alias("c_p"))
    sym = cab.unionByName(
        cab.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "c_ab"
        )
    )
    ca = item_n.select(F.col("p").alias("a"), F.col("c_p").alias("c_a"))
    cb = item_n.select(F.col("p").alias("b"), F.col("c_p").alias("c_b"))
    scored = (
        sym.filter(F.col("c_ab") >= 2)
        .join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .select(
            "a",
            "b",
            "c_ab",
            _fround(
                F.col("c_ab").cast("double")
                / F.sqrt(
                    F.col("c_a").cast("double")
                    * F.col("c_b").cast("double")
                ),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("a").orderBy(
        F.col("cosine").desc(), F.col("b").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            F.col("a").alias("l_partkey"),
            F.col("b").alias("rec_partkey"),
            F.col("c_ab").cast("bigint").alias("n_coorders"),
            "cosine",
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 privacy audit, companion to k_anonymity: l-diversity —
    a QI group is safe only if its SENSITIVE attribute (market
    segment) takes >= l = 3 distinct values; a group can satisfy k
    while every member shares one segment, which k-anonymity alone
    misses. One aggregation over (nation, balance band); output per
    group with the violation flag."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_nationkey").cast("int").alias("nation"),
        F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias(
            "bal_band"
        ),
        F.col("c_mktsegment").alias("seg"),
    )
    return qi.groupBy("nation", "bal_band").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("seg").cast("bigint").alias("distinct_segments"),
        (F.countDistinct("seg") >= 3).cast("int").alias("is_diverse"),
    )


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 marketing attribution: each purchase's value is credited
    to the user's LAST non-purchase touch at or before the purchase —
    classic last-touch conversion attribution, composed directly from
    the engine's as-of join (operators/joins.py::asof_join — the
    union-window merge: one shuffle on the user key, no range-join
    blowup). Purchases with no prior touch land in the '(direct)'
    bucket, so total conversion value is conserved. Value sums in
    decimal, so the report is order-independent."""
    from aproximacion_1_etl_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    conversions = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_type").alias("touch_type"),
    )
    joined = asof_join(
        conversions,
        touches,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["touch_type"],
        tiebreak="event_id",
    )
    return (
        joined.select(
            F.coalesce(F.col("asof_touch_type"), F.lit("(direct)")).alias(
                "touch_type"
            ),
            "value",
        )
        .groupBy("touch_type")
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            _fround(
                F.sum(F.col("value").cast("decimal(38,18)")).cast(
                    "double"
                ),
                2,
            ).alias("attributed_value"),
        )
    )


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 change-point detection: per event type, the positive
    CUSUM drift statistic over the daily-count series — how far the
    cumulative deviation from the type's mean daily volume has risen
    above its historical minimum (the standard sequential drift
    detector for pipeline-volume monitoring).

    Windows, not a fold: s_t = prefix_t - min(0, min_{j<=t} prefix_j)
    where prefix is the running sum of (count - mean). Running sum and
    running min are both ordered window aggregates, so the recursion
    max(0, s+dev) never needs a per-row loop — the shape scales as two
    per-type windows over the |types x days| relation. Drift rounds
    to 6 dp before the argmax ranking so sub-ulp cross-engine window
    summation differences can't flip the peak day."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("x"))
    mu = daily.groupBy("event_type").agg(
        (
            F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
            / F.count("*")
        ).alias("mu")
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    devs = daily.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "day",
        (F.col("x").cast("double") - F.col("mu")).alias("dev"),
        "mu",
    )
    pre = devs.select(
        "event_type",
        "day",
        "mu",
        F.sum("dev").over(wo).alias("prefix"),
    )
    run = pre.select(
        "event_type",
        "day",
        "mu",
        "prefix",
        F.min("prefix").over(wo).alias("runmin"),
    )
    drifted = run.select(
        "event_type",
        "day",
        "mu",
        _fround(
            F.col("prefix") - F.least(F.col("runmin"), F.lit(0.0)), 6
        ).alias("drift"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("drift").desc(), F.col("day").asc()
    )
    return (
        drifted.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("peak_day"),
            _fround(F.col("drift"), 4).alias("max_drift"),
            _fround(F.col("mu"), 4).alias("mean_daily"),
        )
    )


def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 distribution-free uncertainty at scale: a Poisson
    bootstrap 95% CI for the mean order value. The classic resampling
    bootstrap is undistributable (each replicate draws n rows WITH
    replacement — a global shuffle per replicate); the Poisson
    bootstrap replaces each row's replicate multiplicity with an
    independent Poisson(1) weight, so ALL B replicates ride ONE
    map-side fan-out (row x B) into a B-row aggregate — the standard
    big-data bootstrap (Chamandy et al., "Estimating uncertainty for
    massive data streams", Google 2012).

    Determinism: the Poisson draw inverts the CDF on the first 8 hex
    chars of md5(orderkey:replicate) compared against PRECOMPUTED hex
    thresholds — pure string comparisons, the repo's
    deterministic-sample trick, bit-identical on any engine. Replicate
    means use decimal sums; the CI is nearest-rank over the B ordered
    means with a replicate-id tiebreak."""
    B = 64
    # cumulative Poisson(1) CDF -> 8-hex-digit thresholds
    import math as _math

    cdf, acc, k = [], 0.0, 0
    while acc < 0.99999 and k < 8:
        acc += _math.exp(-1.0) / _math.factorial(k)
        cdf.append(min(acc, 1.0))
        k += 1
    thresholds = [format(int(c * 2**32), "08x") for c in cdf]
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    dp = spark.sparkContext.defaultParallelism
    fan = (
        orders.repartition(dp, F.col("o_orderkey"))
        .select(
            "o_orderkey",
            "o_totalprice",
            F.explode(
                F.array(*[F.lit(b) for b in range(B)])
            ).alias("b"),
        )
        .withColumn(
            "h",
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("o_orderkey"), F.col("b")
                    )
                ),
                1,
                8,
            ),
        )
    )
    w: F.Column = F.lit(len(thresholds))
    for k_i in range(len(thresholds) - 1, -1, -1):
        w = F.when(F.col("h") < thresholds[k_i], F.lit(k_i)).otherwise(w)
    reps = (
        fan.select("b", w.alias("w"), "o_totalprice")
        .groupBy("b")
        .agg(
            F.sum(
                (F.col("w") * F.col("o_totalprice")).cast(
                    "decimal(38,18)"
                )
            )
            .cast("double")
            .alias("s"),
            F.sum("w").alias("nw"),
        )
        .select("b", (F.col("s") / F.col("nw")).alias("mean_b"))
    )
    wr = Window.orderBy(F.col("mean_b").asc(), F.col("b").asc())
    ranked = reps.select(
        "mean_b", F.row_number().over(wr).alias("rk")
    )
    lo_rk = max(1, _math.ceil(0.025 * B))
    hi_rk = _math.ceil(0.975 * B)
    point = orders.agg(
        F.count("*").cast("bigint").alias("n"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(38,18)")).cast(
                "double"
            )
            / F.count("*")
        ).alias("mean_raw"),
    )
    lo = ranked.filter(F.col("rk") == lo_rk).select(
        F.col("mean_b").alias("lo_raw")
    )
    hi = ranked.filter(F.col("rk") == hi_rk).select(
        F.col("mean_b").alias("hi_raw")
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n",
            _fround(F.col("mean_raw"), 4).alias("mean_value"),
            _fround(F.col("lo_raw"), 4).alias("ci_lo"),
            _fround(F.col("hi_raw"), 4).alias("ci_hi"),
            F.lit(B).cast("bigint").alias("n_replicates"),
        )
    )


def q_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 skew diagnosis — measure BEFORE salting: for every
    candidate join key in the schema, the key-frequency profile that
    decides the join strategy (max key rows, skew ratio vs the mean
    key, top-key share). Each family is one groupBy + one 1-row
    aggregate; the report is |families| rows. The `is_skewed` flag
    (ratio > 10) is what the salted-agg / replicated-join operators
    key off at 100 TB."""
    families = [
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("events.user_id", "events", "user_id"),
    ]
    out = None
    for label, table, key in families:
        t = load_table(spark, sf_dir, table)
        per_key = t.groupBy(F.col(key)).agg(F.count("*").alias("c"))
        stats = per_key.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_key_rows"),
        ).select(
            F.lit(label).alias("join_key"),
            "n_rows",
            "n_keys",
            "max_key_rows",
            _fround(
                F.col("max_key_rows").cast("double")
                / (
                    F.col("n_rows").cast("double")
                    / F.col("n_keys").cast("double")
                ),
                2,
            ).alias("skew_ratio"),
            _fround(
                F.col("max_key_rows").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("top_key_share"),
        )
        stats = stats.withColumn(
            "is_skewed", (F.col("skew_ratio") > 10.0).cast("int")
        )
        out = stats if out is None else out.unionByName(stats)
    return out


def q_streaming_cusum_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.9 + §2.10: the CUSUM drift detector AS A STREAM — the
    events table arrives in two waves (first half of the month, then
    the rest); foreachBatch maintains an O(|types|) accumulator state
    (prefix end, running min, best drift + peak day, frozen baseline
    mean) in a batch-id log, so per-batch cost is |batch| + |types|
    regardless of history length — the production monitoring topology
    (cusum_drift is the one-shot batch equivalent; this key proves
    the same statistic maintains incrementally).

    Semantics: the baseline mean is FROZEN from the type's first wave
    (how production CUSUM references a historical window — a global
    mean would change retroactively with every batch and force full
    recompute). The CUSUM recursion continues across batches through
    (prefix_end, runmin_end); because wave day-ranges are ordered and
    disjoint, the accumulator is exactly the batch prefix/running-min
    identity, and the final state value-checks against the one-pass
    frozen-baseline oracle. Drift snaps to 6 dp at comparison like
    the batch key."""
    import shutil
    import time as _time

    split_day = "2024-01-16"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    base = tempfile.mkdtemp(prefix="graft_scm_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_scm_")
    src = os.path.join(base, "src")
    state_log = os.path.join(base, "state")

    def handle_batch(batch, batch_id: int) -> None:
        bspark = batch.sparkSession
        daily = batch.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count("*").alias("x"))
        # explicit existence check, not a swallowed read error (the
        # notify-ledger lesson): only a genuinely absent store means
        # "first batch"; a corrupt store must raise
        if os.path.isdir(state_log):
            prior = (
                bspark.read.parquet(state_log)
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("event_type").orderBy(
                            F.col("batch_id").desc()
                        )
                    ),
                )
                .filter(F.col("_rn") == 1)
                .drop("_rn", "batch_id")
            )
        else:
            prior = None
        if prior is not None:
            daily = daily.join(
                F.broadcast(prior), "event_type", "left"
            )
        else:
            for c, t in (
                ("mu", "double"),
                ("prefix_end", "double"),
                ("runmin_end", "double"),
                ("best_drift", "double"),
                ("best_day", "date"),
            ):
                daily = daily.withColumn(c, F.lit(None).cast(t))
        # frozen baseline: first batch where the type appears
        mu_new = daily.groupBy("event_type").agg(
            (
                F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("mu_batch")
        )
        daily = daily.join(F.broadcast(mu_new), "event_type").withColumn(
            "mu_f", F.coalesce(F.col("mu"), F.col("mu_batch"))
        )
        wo = (
            Window.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pre = daily.withColumn(
            "prefix",
            F.coalesce(F.col("prefix_end"), F.lit(0.0))
            + F.sum(F.col("x").cast("double") - F.col("mu_f")).over(wo),
        )
        run = pre.withColumn(
            "runmin",
            F.least(
                F.coalesce(
                    F.col("runmin_end"), F.lit(float("inf"))
                ),
                F.min("prefix").over(wo),
            ),
        ).withColumn(
            "drift",
            _fround(
                F.col("prefix")
                - F.least(F.col("runmin"), F.lit(0.0)),
                6,
            ),
        )
        # fold stored best into the candidate set, then argmax
        # (drift desc, day asc) per type
        cand = run.select(
            "event_type", F.col("day").alias("bday"),
            F.col("drift").alias("bdrift"),
        ).unionByName(
            run.select(
                "event_type",
                F.col("best_day").alias("bday"),
                F.col("best_drift").alias("bdrift"),
            ).filter(F.col("bdrift").isNotNull()).distinct()
        )
        wb = Window.partitionBy("event_type").orderBy(
            F.col("bdrift").desc(), F.col("bday").asc()
        )
        best = (
            cand.withColumn("rn", F.row_number().over(wb))
            .filter(F.col("rn") == 1)
            .select(
                "event_type",
                F.col("bdrift").alias("best_drift"),
                F.col("bday").alias("best_day"),
            )
        )
        wlast = Window.partitionBy("event_type").orderBy(
            F.col("day").desc()
        )
        ends = (
            run.withColumn("rn", F.row_number().over(wlast))
            .filter(F.col("rn") == 1)
            .select(
                "event_type",
                F.col("mu_f").alias("mu"),
                F.col("prefix").alias("prefix_end"),
                F.col("runmin").alias("runmin_end"),
            )
        )
        ends.join(best, "event_type").withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(state_log)

    try:
        ev.filter(
            F.col("ts").cast("date") < split_day
        ).coalesce(1).write.parquet(os.path.join(src, "w1"))
        ev.filter(
            F.col("ts").cast("date") >= split_day
        ).coalesce(1).write.parquet(os.path.join(src, "w2"))
        # wave order: the file source processes files in modification-
        # time order, so pin w1 strictly older than w2 (maxFilesPerTrigger
        # keeps them in separate micro-batches)
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        q = (
            spark.readStream.schema(
                "event_id BIGINT, ts TIMESTAMP, event_type STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        final = (
            spark.read.parquet(state_log)
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("event_type").orderBy(
                        F.col("batch_id").desc()
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
        )
        sel = final.select(
            "event_type",
            F.date_format("best_day", "yyyy-MM-dd").alias("peak_day"),
            _fround(F.col("best_drift"), 4).alias("max_drift"),
            _fround(F.col("mu"), 4).alias("mean_daily"),
        )
        # materialize the |types|-bounded final state so the temp dirs
        # can be reclaimed here instead of leaking per invocation (the
        # returned frame must not depend on the deleted state parquet)
        return spark.createDataFrame(sel.collect(), sel.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_streaming_max_concurrency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.9 + §2.10: the peak-concurrency sweep line AS A STREAM — so
    capacity monitoring doesn't rescan all history daily (the batch
    ``max_concurrency`` is the one-shot equivalent; this key proves
    the same statistic maintains incrementally). Events arrive in two
    day-ordered waves; foreachBatch keeps, per event type:

    - a finalized summary (running offset = concurrency entering the
      unfinalized region, peak so far + its first instant, interval
      count) — O(|keys|);
    - the unfinalized TAIL of boundary deltas — only instants the
      event-time watermark hasn't passed. Interval length is bounded
      (<= 300 s here) and waves are day-disjoint and ordered, so every
      future delta lands at/after the day after the batch's max start
      day: deltas before that cutoff fold into the summary (running
      sum continues FROM the stored offset) and are discarded. State
      is O(|keys| x |tail instants|), never O(history).

    Cross-wave end/start collisions at the same instant stay exact
    because the tail holds raw deltas: a wave-1 "-1" parked at t
    merges with wave-2's "+1" at t before any running sum sees them
    (the [start, end) exclusivity rule). The intra-batch running sum
    windows per key over one batch's deltas; at 100 TB that window is
    the bucketed two-phase form of operators/intervals.py. Final
    state value-checks against the batch oracle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    return _run_streaming_max_concurrency(spark, ev, "2024-01-16")


def _run_streaming_max_concurrency(
    spark: SparkSession, ev: DataFrame, split_day: str
) -> DataFrame:
    """Two-wave foreachBatch sweep-line maintenance over ``ev``
    (event_id, ts, event_type); see q_streaming_max_concurrency."""
    import shutil
    import time as _time
    base = tempfile.mkdtemp(prefix="graft_smc_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_smc_")
    src = os.path.join(base, "src")
    summary_log = os.path.join(base, "summary")
    tail_log = os.path.join(base, "tail")

    def _latest_summary(bspark):
        if not os.path.isdir(summary_log):
            return None
        return (
            bspark.read.parquet(summary_log)
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("event_type").orderBy(
                        F.col("batch_id").desc()
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn", "batch_id")
        )

    def _latest_tail(bspark):
        if not os.path.isdir(tail_log):
            return None
        # the authoritative "latest batch" comes from the SUMMARY log:
        # a batch whose new tail is EMPTY writes zero tail rows, so
        # max(batch_id) over the tail itself would resurrect an older
        # batch's tail whose deltas were already folded into the
        # summary (a double count)
        mx = (
            bspark.read.parquet(summary_log)
            .agg(F.max("batch_id"))
            .collect()[0][0]
        )
        t = bspark.read.parquet(tail_log)
        return t.filter(F.col("batch_id") == mx).drop("batch_id")

    def handle_batch(batch, batch_id: int) -> None:
        bspark = batch.sparkSession
        iv = batch.select(
            "event_type",
            F.col("ts").alias("s"),
            F.expr(
                "ts + make_dt_interval(0, 0, 0, "
                "CAST(60 + event_id % 240 AS DOUBLE))"
            ).alias("e"),
        )
        bd = (
            iv.select("event_type", F.col("s").alias("t"), F.lit(1).alias("d"))
            .unionByName(
                iv.select(
                    "event_type", F.col("e").alias("t"), F.lit(-1).alias("d")
                )
            )
            .groupBy("event_type", "t")
            .agg(F.sum("d").cast("bigint").alias("delta"))
        )
        prior = _latest_summary(bspark)
        tail = _latest_tail(bspark)
        if tail is not None:
            bd = (
                bd.unionByName(tail)
                .groupBy("event_type", "t")
                .agg(F.sum("delta").cast("bigint").alias("delta"))
            )
        # watermark cutoff: waves are day-ordered, intervals <= 300 s,
        # so no future boundary can land before the day after this
        # batch's max start day. An EMPTY batch has no max day — the
        # event-time watermark made no progress, so finalize nothing
        # and carry the whole merged tail forward (a NULL cutoff would
        # silently drop every parked delta: both t < NULL and
        # t >= NULL are false).
        max_day = iv.agg(F.max(F.to_date("s"))).collect()[0][0]
        if max_day is None:
            fin = bd.filter(F.lit(False))
            new_tail = bd
        else:
            cutoff = (
                F.lit(str(max_day)).cast("date") + F.expr("INTERVAL 1 DAY")
            ).cast("timestamp")
            fin = bd.filter(F.col("t") < cutoff)
            new_tail = bd.filter(F.col("t") >= cutoff)

        # keys never seen before (first batch, or a type debuting in a
        # later wave) start from zero state
        keys = bd.select("event_type").distinct()
        zero = keys.select(
            "event_type",
            F.lit(0).cast("bigint").alias("offset"),
            F.lit(None).cast("bigint").alias("peak"),
            F.lit(None).cast("timestamp").alias("peak_at"),
            F.lit(0).cast("bigint").alias("n_intervals"),
        )
        if prior is None:
            prior = zero
        else:
            prior = prior.unionByName(
                zero.join(prior, "event_type", "left_anti")
            )
        wrun = (
            Window.partitionBy("event_type")
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        run = (
            fin.join(prior.select("event_type", "offset"), "event_type")
            .withColumn(
                "running", F.col("offset") + F.sum("delta").over(wrun)
            )
        )
        wb = Window.partitionBy("event_type").orderBy(
            F.col("running").desc(), F.col("t").asc()
        )
        chunk_best = (
            run.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") == 1)
            .select(
                "event_type",
                F.col("running").alias("c_peak"),
                F.col("t").alias("c_at"),
            )
        )
        fin_sums = fin.groupBy("event_type").agg(
            F.sum("delta").cast("bigint").alias("fin_delta")
        )
        n_new = iv.groupBy("event_type").agg(
            F.count("*").cast("bigint").alias("n_new")
        )
        upd = (
            prior.join(chunk_best, "event_type", "left")
            .join(fin_sums, "event_type", "left")
            .join(n_new, "event_type", "left")
            .select(
                "event_type",
                (
                    F.col("offset") + F.coalesce("fin_delta", F.lit(0))
                ).alias("offset"),
                # better chunk peak wins; ties keep the EARLIER instant
                F.when(
                    F.col("peak").isNull()
                    | (F.col("c_peak") > F.col("peak")),
                    F.col("c_peak"),
                )
                .otherwise(F.col("peak"))
                .alias("peak"),
                F.when(
                    F.col("peak").isNull()
                    | (F.col("c_peak") > F.col("peak")),
                    F.col("c_at"),
                )
                .otherwise(F.col("peak_at"))
                .alias("peak_at"),
                (
                    F.col("n_intervals") + F.coalesce("n_new", F.lit(0))
                ).alias("n_intervals"),
            )
        )
        upd.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(summary_log)
        new_tail.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(tail_log)

    try:
        ev.filter(
            F.col("ts").cast("date") < split_day
        ).coalesce(1).write.parquet(os.path.join(src, "w1"))
        ev.filter(
            F.col("ts").cast("date") >= split_day
        ).coalesce(1).write.parquet(os.path.join(src, "w2"))
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        q = (
            spark.readStream.schema(
                "event_id BIGINT, ts TIMESTAMP, event_type STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

        # end-of-stream flush: fold the remaining tail (cutoff = inf)
        summ = _latest_summary(spark)
        tail = _latest_tail(spark)
        wrun = (
            Window.partitionBy("event_type")
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wb = Window.partitionBy("event_type").orderBy(
            F.col("running").desc(), F.col("t").asc()
        )
        tail_best = (
            tail.join(summ.select("event_type", "offset"), "event_type")
            .withColumn(
                "running", F.col("offset") + F.sum("delta").over(wrun)
            )
            .withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") == 1)
            .select(
                "event_type",
                F.col("running").alias("c_peak"),
                F.col("t").alias("c_at"),
            )
        )
        final = (
            summ.join(tail_best, "event_type", "left")
            .select(
                "event_type",
                "n_intervals",
                F.when(
                    F.col("c_peak").isNotNull()
                    & (
                        F.col("peak").isNull()
                        | (F.col("c_peak") > F.col("peak"))
                    ),
                    F.col("c_peak"),
                )
                .otherwise(F.col("peak"))
                .alias("peak_concurrency"),
                F.when(
                    F.col("c_peak").isNotNull()
                    & (
                        F.col("peak").isNull()
                        | (F.col("c_peak") > F.col("peak"))
                    ),
                    F.col("c_at"),
                )
                .otherwise(F.col("peak_at"))
                .alias("peak_at"),
            )
            .select(
                "event_type",
                "n_intervals",
                "peak_concurrency",
                F.date_format("peak_at", "yyyy-MM-dd HH:mm:ss").alias(
                    "peak_at"
                ),
            )
            .orderBy("event_type")
        )
        return spark.createDataFrame(final.collect(), final.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 survival analysis: Kaplan-Meier time-to-first-purchase
    after first signup, with administrative right-censoring at corpus
    end — the product-limit estimator product analytics and churn
    models consume. Per-user durations reduce to a |days|-sized
    day-level relation; at-risk counts and the survival curve are
    ordered windows over it (cumulative product expressed as
    exp(sum(ln(1 - d/n))) — a sum over an ordered frame, so both
    engines accumulate in the same sequence; output rounds absorb
    sub-ulp exp/ln differences). No corpus-sized window anywhere: the
    heavy relations are the two per-user aggregates."""
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    first_purchase = (
        su.join(
            pu,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("signup_ts")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("event_ts"))
    )
    horizon = ev.agg(F.max(F.col("ts").cast("date")).alias("hday"))
    durations = first_purchase.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.when(
            F.col("event_ts").isNotNull(),
            F.datediff(
                F.col("event_ts").cast("date"),
                F.col("signup_ts").cast("date"),
            ),
        )
        .otherwise(
            F.datediff(F.col("hday"), F.col("signup_ts").cast("date"))
        )
        .cast("int")
        .alias("t"),
        F.col("event_ts").isNotNull().cast("int").alias("is_event"),
    )
    day_level = durations.groupBy("t").agg(
        F.sum("is_event").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("is_event")).cast("bigint").alias("c"),
        F.count("*").cast("bigint").alias("n_t"),
    )
    wcum = (
        Window.orderBy("t").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    wprev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = durations.agg(F.count("*").alias("n_total"))
    risk = day_level.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(F.sum("n_t").over(wprev), F.lit(0))
        )
        .cast("bigint")
        .alias("at_risk"),
    )
    # d == at_risk makes the factor 0 and survival 0 from that day on;
    # ln(0) raises in DuckDB (and yields -inf in Spark), so zero
    # factors contribute ln(1) inside the sum and an explicit
    # any-zero-so-far flag pins the curve to 0.0 — identical logic on
    # both engines.
    factor = (
        F.lit(1.0)
        - F.col("d").cast("double") / F.col("at_risk").cast("double")
    )
    surv = risk.select(
        "t",
        "d",
        "c",
        "at_risk",
        F.when(
            F.max((F.col("d") == F.col("at_risk")).cast("int")).over(
                wcum
            )
            == 1,
            F.lit(0.0),
        )
        .otherwise(
            F.exp(
                F.sum(
                    F.log(
                        F.when(factor > 0, factor).otherwise(F.lit(1.0))
                    )
                ).over(wcum)
            )
        )
        .alias("s_raw"),
    )
    return surv.select(
        F.col("t").alias("day"),
        F.col("at_risk").alias("n_at_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        _fround(F.col("s_raw"), 6).alias("survival"),
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


def q_forget_user_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 right-to-be-forgotten as a CASCADE over the versioned
    store: a deterministic subject set (user/customer keys hashed into
    the md5-prefix sampler's lowest band, ~3% of subjects — the same
    portable selector the samplers use) is erased across the fact
    tables — events by user_id, orders by custkey, lineitem through
    the orders FK — as deletion-vector logical deletes (kilobytes of
    intent, zero data-file rewrite at any scale; the erasure
    physically materializes at the next compaction). The returned
    audit manifest is what a DPO consumes: per table, rows before,
    rows logically deleted, rows visible after, and a zero
    still-visible count verified THROUGH the DV read path itself.

    The FK cascade is the part plain row deletes get wrong: lineitem
    carries no user key, so its subject rows are found by a
    (broadcast) semi-join through the deleted orders."""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix
    from aproximacion_1_etl_spark.sources.versioned import (
        delete_rows,
        read_snapshot_with_dv,
        write_snapshot,
    )

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    subj = F.col("_subject_key")
    band = _hash_prefix(subj) < "0800"  # lowest 1/32 of the hash space

    base = tempfile.mkdtemp(prefix="graft_forget_")
    # The FK cascade is resolved by DENORMALIZING the subject key onto
    # lineitem before snapshotting (one orderkey join): a
    # forget-capable lake must keep every fact row resolvable to its
    # data subject, and with the key carried, all three tables share
    # the identical band predicate — no per-key IN-lists, no collect,
    # nothing subject-set-sized ever reaches the driver.
    li_keyed = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .withColumn(
            "_row_id",
            F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber")),
        )
        .withColumn("_subject_key", F.col("o_custkey"))
        .drop("o_orderkey", "o_custkey")
    )
    plan = [
        ("events", ev.withColumn("_subject_key", F.col("user_id")),
         "event_id"),
        ("orders", orders.withColumn("_subject_key", F.col("o_custkey")),
         "o_orderkey"),
        ("lineitem", li_keyed, "_row_id"),
    ]
    band_sql = (
        "substring(md5(cast(_subject_key as string)), 1, 4) < '0800'"
    )
    rows = []
    try:
        for name, df, pk in plan:
            path = f"{base}/{name}"
            write_snapshot(df, path)
            n_before = df.count()
            n_del = delete_rows(spark, path, pk, band_sql)
            after = read_snapshot_with_dv(spark, path)
            n_after = after.count()
            still = after.filter(band).count()
            rows.append((name, n_before, n_del, n_after, still))
        return spark.createDataFrame(
            rows,
            "table_name string, n_before bigint, n_deleted bigint, "
            "n_after bigint, n_subject_still_visible bigint",
        )
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)


def q_streaming_forget_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + §2.10 right-to-be-forgotten UNDER CONCURRENT APPENDS —
    the compliance shape a 100 TB lake actually needs: erasure arrives
    mid-stream, and both the history BEFORE it and every append AFTER
    it must honor it.

    Topology: the events table is a versioned snapshot store
    (sources/versioned.py); waves 2 and 3 arrive as a file stream and
    each foreachBatch publishes the next snapshot version (current
    read THROUGH the deletion vector + the new batch — appends
    materialize standing erasures). After wave 2 lands, the RTBF
    request fires: every banded subject seen so far (md5-prefix band,
    the engine's deterministic sampler) is written to a forget
    registry, and delete_rows appends their rows to the current
    version's DV — kilobytes of intent, no data-file rewrite. Wave 3
    then appends with the registry anti-joined out, so a forgotten
    subject's LATER events never surface either; a banded user first
    seen in wave 3 never requested erasure and stays visible (the
    registry, not the band, is the authority — erasure is a recorded
    request, not a property of the hash).

    Audit (per event_type, measured THROUGH the DV read path on the
    final version): visible rows, forgotten rows, and
    n_registry_still_visible which MUST be 0. Deterministic end
    state, so the key value-checks against a DuckDB replay of the
    registry/visibility spec."""
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.sources.versioned import (
        delete_rows,
        read_snapshot_with_dv,
        write_snapshot,
    )

    w2_start, w3_start = "2024-01-11", "2024-01-21"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id"
    )
    band_sql = "substring(md5(cast(user_id as string)), 1, 4) < '0800'"
    base = tempfile.mkdtemp(prefix="graft_sfu_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_sfu_")
    src = os.path.join(base, "src")
    store = os.path.join(base, "store")
    reg_dir = os.path.join(base, "registry")

    def handle_batch(batch, batch_id: int) -> None:
        bspark = batch.sparkSession
        cur = read_snapshot_with_dv(bspark, store)
        if os.path.isdir(reg_dir):
            reg = bspark.read.parquet(reg_dir)
            batch = batch.join(
                F.broadcast(reg.distinct()), "user_id", "left_anti"
            )
        write_snapshot(cur.unionByName(batch), store)
        if batch_id == 0:
            # the RTBF request wave arrives after the first streamed
            # append: record every banded subject seen SO FAR as the
            # erasure authority, then logically delete their history
            snap = read_snapshot_with_dv(bspark, store)
            snap.filter(band_sql).select(
                "user_id"
            ).distinct().write.mode("overwrite").parquet(reg_dir)
            delete_rows(bspark, store, "event_id", band_sql)

    try:
        write_snapshot(
            ev.filter(F.col("ts").cast("date") < w2_start), store
        )
        ev.filter(
            (F.col("ts").cast("date") >= w2_start)
            & (F.col("ts").cast("date") < w3_start)
        ).coalesce(1).write.parquet(os.path.join(src, "w2"))
        ev.filter(
            F.col("ts").cast("date") >= w3_start
        ).coalesce(1).write.parquet(os.path.join(src, "w3"))
        now = _time.time()
        for d, ts in (("w2", now - 120), ("w3", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        q = (
            spark.readStream.schema(
                "event_id BIGINT, ts TIMESTAMP, event_type STRING, "
                "user_id BIGINT"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        final = read_snapshot_with_dv(spark, store)
        reg = spark.read.parquet(reg_dir).distinct()
        vis = (
            final.join(F.broadcast(reg), "user_id", "left_semi")
            .groupBy("event_type")
            .agg(F.count("*").alias("n_registry_still_visible"))
        )
        visible = final.groupBy("event_type").agg(
            F.count("*").alias("n_visible")
        )
        forgotten = (
            ev.join(F.broadcast(reg), "user_id", "left_semi")
            .groupBy("event_type")
            .agg(F.count("*").alias("n_forgotten"))
        )
        sel = (
            visible.join(forgotten, "event_type", "left")
            .join(vis, "event_type", "left")
            .select(
                "event_type",
                F.col("n_visible").cast("bigint").alias("n_visible"),
                F.coalesce("n_forgotten", F.lit(0))
                .cast("bigint")
                .alias("n_forgotten"),
                F.coalesce("n_registry_still_visible", F.lit(0))
                .cast("bigint")
                .alias("n_registry_still_visible"),
            )
        )
        # |event_types|-bounded: materialize so the temp store can be
        # reclaimed here instead of leaking per invocation
        return spark.createDataFrame(sel.collect(), sel.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 experimentation analytics: a hash-randomized A/B
    readout — users split 50/50 by the md5-band assigner (the
    engine's deterministic sampler, so assignment is stable across
    runs and engines), per-arm purchase-value mean/variance from one
    aggregation, and the Welch t-statistic computed from the
    aggregated moments with identical IEEE expressions on both
    engines. The whole report is two shuffles (per-user rollup,
    per-arm rollup) at any scale."""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(38,18)"))
            .cast("double")
            .alias("user_value")
        )
        .withColumn(
            "arm",
            F.when(_hash_prefix(F.col("user_id")) < "8000", "A").otherwise(
                "B"
            ),
        )
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum(F.col("user_value").cast("decimal(38,18)"))
        .cast("double")
        .alias("s1"),
        F.sum(
            (F.col("user_value") * F.col("user_value")).cast(
                "decimal(38,18)"
            )
        )
        .cast("double")
        .alias("s2"),
    )
    a = arms.filter(F.col("arm") == "A").select(
        F.col("n_users").alias("na"),
        F.col("s1").alias("sa"),
        F.col("s2").alias("qa"),
    )
    b = arms.filter(F.col("arm") == "B").select(
        F.col("n_users").alias("nb"),
        F.col("s1").alias("sb"),
        F.col("s2").alias("qb"),
    )
    j = a.crossJoin(F.broadcast(b))
    mean_a = F.col("sa") / F.col("na")
    mean_b = F.col("sb") / F.col("nb")
    var_a = (
        F.col("qa") / F.col("na") - mean_a * mean_a
    ) * (F.col("na") / (F.col("na") - F.lit(1)))
    var_b = (
        F.col("qb") / F.col("nb") - mean_b * mean_b
    ) * (F.col("nb") / (F.col("nb") - F.lit(1)))
    t = (mean_a - mean_b) / F.sqrt(
        var_a / F.col("na") + var_b / F.col("nb")
    )
    return j.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        _fround(mean_a, 4).alias("mean_a"),
        _fround(mean_b, 4).alias("mean_b"),
        _fround(mean_b - mean_a, 4).alias("lift"),
        _fround(t, 4).alias("welch_t"),
    )


def q_psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 distribution-drift monitoring: Population Stability
    Index of the quality-score distribution between two deterministic
    corpus halves (md5 hash-band of doc_id — the sampler's portable
    splitter; a naive doc_id parity is DEGENERATE here because
    doc_id mod |sources| assigns each source a fixed parity), per
    source — the reference-vs-current window stand-in. PSI =
    sum_buckets (p - q) * ln(p / q) over a fixed 10-cell score grid
    with epsilon-floored proportions — the standard model-monitoring
    drift score, complementing cusum_drift's volume view with a
    SHAPE view. One scan + two tiny keyed aggregations; the bucket
    grid bounds all downstream state."""
    from aproximacion_1_etl_spark.text.analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix

    scored = docs.select(
        "source",
        (_hash_prefix(F.col("doc_id")) < "8000").alias("is_ref"),
        F.least(
            F.floor(quality_score(F.col("text")) * 10).cast("int"),
            F.lit(9),
        ).alias("bkt"),
    )
    cells = scored.groupBy("source", "is_ref", "bkt").agg(
        F.count("*").alias("c")
    )
    tots = cells.groupBy("source", "is_ref").agg(
        F.sum("c").alias("n")
    )
    # dense (source x side x bucket) grid so empty cells get the
    # epsilon floor on BOTH sides
    grid = (
        cells.select("source").distinct()
        .crossJoin(spark.range(10).select(F.col("id").cast("int").alias("bkt")))
        .crossJoin(
            spark.createDataFrame(
                [(True,), (False,)], "is_ref boolean"
            )
        )
    )
    dense = (
        grid.join(cells, ["source", "is_ref", "bkt"], "left")
        .fillna({"c": 0})
        .join(tots, ["source", "is_ref"])
        .select(
            "source",
            "is_ref",
            "bkt",
            F.greatest(
                F.col("c").cast("double") / F.col("n").cast("double"),
                F.lit(1e-4),
            ).alias("p"),
        )
    )
    # ref/current as a conditional-aggregation pivot, NOT a self-join
    # of dense with complementary filters — Spark's self-join lineage
    # dedup collapses the two is_ref filters onto one attribute and
    # returns the empty set (observed); one keyed aggregation is also
    # simply the better plan.
    paired = dense.groupBy("source", "bkt").agg(
        F.max(F.when(F.col("is_ref"), F.col("p"))).alias("p_ref"),
        F.max(F.when(~F.col("is_ref"), F.col("p"))).alias("p_cur"),
    )
    return (
        paired.groupBy("source")
        .agg(
            F.sum(
                (
                    (F.col("p_cur") - F.col("p_ref"))
                    * F.log(F.col("p_cur") / F.col("p_ref"))
                ).cast("decimal(38,18)")
            )
            .cast("double")
            .alias("psi_raw")
        )
        .select("source", _fround(F.col("psi_raw"), 6).alias("psi"))
    )


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 grouped forecasting: Holt double exponential smoothing
    (level + linear trend) per event type over the daily-count
    series, with a 7-day-ahead forecast — the per-key volume
    forecaster capacity planning runs over thousands of series at
    once. The distributed work is the corpus -> daily rollup; each
    type's 30-value series then folds IN-PLAN through a higher-order
    `aggregate` with a (level, trend) struct accumulator — state per
    group is |days| doubles, the same bounded-collect rule as the
    per-user sequence strings, and no UDF appears anywhere.

    Engine parity: the fold order is the sorted day order on both
    engines (DuckDB replays it with list_reduce over the identical
    list), the smoothing constants are exact binary fractions
    (alpha = 0.5, beta = 0.25), and every update is the same IEEE
    expression — so level/trend/forecast agree bit-for-bit before the
    output rounding. Standard init: level = x1, trend = x2 - x1."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s.getField("x").cast("double"),
        ).alias("xs")
    ).filter(F.size("xs") >= 3)
    xs = F.col("xs")
    x1, x2 = F.element_at(xs, 1), F.element_at(xs, 2)
    init = F.struct(x1.alias("l"), (x2 - x1).alias("t"))
    rest = F.slice(xs, 3, F.greatest(F.size(xs) - 2, F.lit(0)))
    a, b = F.lit(0.5), F.lit(0.25)

    def step(acc, x):
        lvl = a * x + (F.lit(1.0) - a) * (
            acc.getField("l") + acc.getField("t")
        )
        trd = b * (
            (
                a * x
                + (F.lit(1.0) - a)
                * (acc.getField("l") + acc.getField("t"))
            )
            - acc.getField("l")
        ) + (F.lit(1.0) - b) * acc.getField("t")
        return F.struct(lvl.alias("l"), trd.alias("t"))

    folded = series.select(
        "event_type",
        F.size(xs).cast("bigint").alias("n_days"),
        F.aggregate(rest, init, step).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_days",
        _fround(F.col("st").getField("l"), 4).alias("level"),
        _fround(F.col("st").getField("t"), 4).alias("trend"),
        _fround(
            F.col("st").getField("l")
            + F.lit(7.0) * F.col("st").getField("t"),
            4,
        ).alias("forecast_7d"),
    )


_LOGREG_CACHE: dict[tuple, list[float]] = {}


def _logreg_feats(spark: SparkSession, sf_dir: str):
    from aproximacion_1_etl_spark.text.vector import _as_double

    emb = _as_double(load_table(spark, sf_dir, "embeddings"), "embedding")
    return emb.select(
        "vec_id",
        F.when(F.col("label") < 5, 1.0).otherwise(0.0).alias("y"),
        F.element_at("embedding", 1).alias("x1"),
        F.element_at("embedding", 2).alias("x2"),
        F.element_at("embedding", 3).alias("x3"),
    )


def _trained_logreg_weights(spark: SparkSession, sf_dir: str) -> list[float]:
    """Train-once-per-corpus logreg weight vector (memoized on (sf_dir,
    parquet mtime)). Named builder so bench warmup can pre-build it
    with its own line item (same cost model as the IVF codebook;
    training cost is carried by the logreg_label_model key itself)."""
    from aproximacion_1_etl_spark.operators.ml import (
        logistic_regression_gd,
    )

    key = _artifact_key(sf_dir, "embeddings")
    w = _LOGREG_CACHE.get(key)
    if w is None:
        w = logistic_regression_gd(
            _logreg_feats(spark, sf_dir).select("y", "x1", "x2", "x3"),
            ["x1", "x2", "x3"],
            iterations=12,
            lr=2.0,
        )
        _LOGREG_CACHE[key] = w
    return w


def _logreg_scored(spark: SparkSession, sf_dir: str):
    """Shared eval relation: the GD-trained model's probability and
    label per embedding row (weights driver-held like the codebook;
    p snapped to 9 dp so sub-ulp exp() differences can never cross a
    bin or rank boundary). Deterministic, so the memo never changes a
    result."""
    feats = _logreg_feats(spark, sf_dir)
    w = _trained_logreg_weights(spark, sf_dir)
    z = (
        F.lit(0.0)
        + F.lit(w[0]) * F.lit(1.0)
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )
    return feats.select(
        "vec_id",
        "y",
        _fround(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9).alias("p"),
    )


def q_model_calibration_ece(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 model evaluation: reliability table + Expected
    Calibration Error for the GD-trained classifier — EQUAL-MASS
    deciles of the score (rank-based binning; fixed-width probability
    bins degenerate to one cell when a weak model concentrates p near
    0.5, observed), per-bin mean confidence vs empirical accuracy,
    ECE = sum |acc - conf| * n_b / n. Ranks come from the bucketed
    two-phase prefix sum — no single-task global window."""
    scored = _logreg_scored(spark, sf_dir)
    bucketed = scored.withColumn(
        "bkt", F.least(F.floor(F.col("p") * 1000).cast("int"), F.lit(999))
    )
    boff = (
        bucketed.groupBy("bkt")
        .agg(F.count("*").alias("bn"))
        .select(
            "bkt",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    wb = Window.partitionBy("bkt").orderBy("p", "vec_id")
    ranked = (
        bucketed.withColumn("rb", F.row_number().over(wb))
        .join(boff, "bkt")
        .select("y", "p", (F.col("off") + F.col("rb")).alias("r"))
    )
    n_tot = scored.agg(F.count("*").alias("n_all"))
    binned = ranked.crossJoin(F.broadcast(n_tot)).select(
        "y",
        "p",
        F.expr("CAST(((r - 1) * 10) div n_all AS INT)").alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_b"),
        F.sum(F.col("p").cast("decimal(38,18)"))
        .cast("double")
        .alias("sp"),
        F.sum(F.col("y").cast("decimal(38,18)"))
        .cast("double")
        .alias("sy"),
    )
    tot = per_bin.agg(F.sum("n_b").alias("n"))
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_b",
            _fround(F.col("sp") / F.col("n_b"), 4).alias("confidence"),
            _fround(F.col("sy") / F.col("n_b"), 4).alias("accuracy"),
            _fround(
                F.abs(
                    F.col("sy") / F.col("n_b") - F.col("sp") / F.col("n_b")
                )
                * F.col("n_b").cast("double")
                / F.col("n").cast("double"),
                6,
            ).alias("ece_contrib"),
        )
    )


def q_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 model evaluation: exact ROC-AUC for the GD-trained
    classifier by the Mann-Whitney rank-sum identity
    AUC = (sum of positive ranks - n_pos(n_pos+1)/2) / (n_pos*n_neg),
    with AVERAGE ranks over score ties so the value is the true
    trapezoidal ROC area. Global ranking uses the bucketed two-phase
    prefix sum over the 9-dp-snapped scores (the vocab_growth /
    quantile_normalize pattern) — no single-task global window; ties
    resolve per score group via min/max rank windows, which are
    |distinct scores|-partitioned."""
    scored = _logreg_scored(spark, sf_dir)
    bucketed = scored.withColumn(
        "bkt", F.least(F.floor(F.col("p") * 1000).cast("int"), F.lit(999))
    )
    boff = (
        bucketed.groupBy("bkt")
        .agg(F.count("*").alias("bn"))
        .select(
            "bkt",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    wb = Window.partitionBy("bkt").orderBy("p", "vec_id")
    ranked = (
        bucketed.withColumn("rb", F.row_number().over(wb))
        .join(boff, "bkt")
        .select(
            "y", "p", (F.col("off") + F.col("rb")).alias("r")
        )
    )
    # average rank per tied score group (p is 9-dp snapped, so ties
    # are exact equalities)
    wg = Window.partitionBy("p")
    avg_ranked = ranked.select(
        "y",
        (
            (F.min("r").over(wg) + F.max("r").over(wg)).cast("double")
            / F.lit(2.0)
        ).alias("ar"),
    )
    agg = avg_ranked.agg(
        F.sum(F.when(F.col("y") == 1.0, F.col("ar"))).alias("rs"),
        F.sum((F.col("y") == 1.0).cast("bigint")).alias("np"),
        F.sum((F.col("y") == 0.0).cast("bigint")).alias("nn"),
    )
    return agg.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        _fround(
            (
                F.col("rs")
                - F.col("np").cast("double")
                * (F.col("np").cast("double") + F.lit(1.0))
                / F.lit(2.0)
            )
            / (
                F.col("np").cast("double") * F.col("nn").cast("double")
            ),
            6,
        ).alias("auc"),
    )


def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 distribution-free predictive uncertainty: SPLIT-CONFORMAL
    interval for the hour/dow OLS value model — fit on the md5-band
    training half, take q_hat = the ceil(0.9 * (n_cal + 1))-th
    smallest absolute calibration residual (the finite-sample-valid
    conformal quantile, an exact order statistic, not an interpolated
    percentile), and report empirical coverage of mean ± q_hat on the
    training half. The order statistic comes from the bucketed
    two-phase rank over |residual| — no single-task global sort.
    Everything is one fit aggregation + two residual passes; the
    weights never leave the plan."""
    ev = load_table(spark, sf_dir, "events")
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix

    feat = ev.select(
        "event_id",
        F.col("value").alias("y"),
        F.hour("ts").cast("bigint").alias("h"),
        F.pmod(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-05")),
            F.lit(7),
        )
        .cast("bigint")
        .alias("d"),
        (_hash_prefix(F.col("event_id")) < "8000").alias("is_train"),
    )
    tr = feat.filter(F.col("is_train"))
    agg = tr.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("h").alias("sh"),
        F.sum("d").alias("sd"),
        F.sum(F.col("h") * F.col("h")).alias("shh"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("h") * F.col("d")).alias("shd"),
        F.sum(F.col("y").cast("decimal(38,18)")).alias("sy"),
        F.sum((F.col("y") * F.col("h")).cast("decimal(38,18)")).alias("shy"),
        F.sum((F.col("y") * F.col("d")).cast("decimal(38,18)")).alias("sdy"),
    )
    m = agg.selectExpr(
        "CAST(n AS DOUBLE) AS nd",
        "CAST(sh AS DOUBLE) AS shd_",
        "CAST(sd AS DOUBLE) AS sdd_",
        "CAST(shh AS DOUBLE) AS shhd",
        "CAST(sdd AS DOUBLE) AS sddd",
        "CAST(shd AS DOUBLE) AS shdd",
        "CAST(sy AS DOUBLE) AS syd",
        "CAST(shy AS DOUBLE) AS shyd",
        "CAST(sdy AS DOUBLE) AS sdyd",
    )
    det = (
        "(nd*(shhd*sddd - shdd*shdd) - shd_*(shd_*sddd - shdd*sdd_)"
        " + sdd_*(shd_*shdd - shhd*sdd_))"
    )
    det0 = (
        "(syd*(shhd*sddd - shdd*shdd) - shd_*(shyd*sddd - shdd*sdyd)"
        " + sdd_*(shyd*shdd - shhd*sdyd))"
    )
    det1 = (
        "(nd*(shyd*sddd - shdd*sdyd) - syd*(shd_*sddd - shdd*sdd_)"
        " + sdd_*(shd_*sdyd - shyd*sdd_))"
    )
    det2 = (
        "(nd*(shhd*sdyd - shyd*shdd) - shd_*(shd_*sdyd - shyd*sdd_)"
        " + syd*(shd_*shdd - shhd*sdd_))"
    )
    w = m.selectExpr(
        f"{det0} / {det} AS w0",
        f"{det1} / {det} AS w1",
        f"{det2} / {det} AS w2",
    )
    scored = feat.crossJoin(F.broadcast(w)).select(
        "event_id",
        "is_train",
        _fround(
            F.abs(
                F.col("y")
                - (
                    F.col("w0")
                    + F.col("w1") * F.col("h").cast("double")
                    + F.col("w2") * F.col("d").cast("double")
                )
            ),
            9,
        ).alias("ar"),
    )
    cal = scored.filter(~F.col("is_train"))
    # two-phase exact rank over |residual| (values < ~500, so a unit
    # grid gives ~500 buckets)
    bucketed = cal.withColumn("bkt", F.floor("ar").cast("int"))
    boff = (
        bucketed.groupBy("bkt")
        .agg(F.count("*").alias("bn"))
        .select(
            "bkt",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    wb = Window.partitionBy("bkt").orderBy("ar", "event_id")
    ranked = (
        bucketed.withColumn("rb", F.row_number().over(wb))
        .join(boff, "bkt")
        .select("ar", (F.col("off") + F.col("rb")).alias("r"))
    )
    ncal = cal.agg(F.count("*").alias("n_cal"))
    qhat = (
        ranked.crossJoin(F.broadcast(ncal))
        .filter(
            F.col("r")
            == F.least(
                F.ceil(F.lit(0.9) * (F.col("n_cal") + F.lit(1)).cast("double")),
                F.col("n_cal").cast("bigint"),
            )
        )
        .select(F.col("ar").alias("q_hat"), "n_cal")
    )
    cov = (
        scored.filter(F.col("is_train"))
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.count("*").cast("bigint").alias("n_train"),
            F.first("n_cal").cast("bigint").alias("n_cal"),
            _fround(F.first("q_hat"), 4).alias("q_hat"),
            _fround(
                F.sum((F.col("ar") <= F.col("q_hat")).cast("int")).cast(
                    "double"
                )
                / F.count("*"),
                4,
            ).alias("coverage_train"),
        )
    )
    return cov


def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 distributed tree learning, the base case: a depth-1
    regression stump for value ~ hour. ALL 23 candidate splits are
    evaluated in ONE aggregation pass — per candidate c, the
    conditional left-count and left-sum (exact decimal) ride
    generated `sum(when(h <= c, ...))` columns, so the corpus is
    scanned once no matter how many candidates; per-split SSE then
    unfolds from the sums algebraically (SSE = Q - sumL²/nL -
    sumR²/nR needs only n/S/Q and the per-side sums) in a 23-row
    projected explode, and the argmin is a min-ordered window with a
    deterministic tiebreak. This is the exact structure every
    histogram-based GBDT (LightGBM-style) uses per node — candidates
    x features in one pass over the data.

    SSE uses a decimal Q (sum of y²), so split scores are
    order-independent; scores round to 6 dp before the argmin."""
    ev = load_table(spark, sf_dir, "events")
    feat = ev.select(
        F.col("value").alias("y"), F.hour("ts").cast("int").alias("h")
    )
    cands = list(range(23))
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("y").cast("decimal(38,18)")).alias("s"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,18)")).alias("q"),
    ]
    for c in cands:
        aggs.append(
            F.sum(F.when(F.col("h") <= c, 1).otherwise(0))
            .cast("bigint")
            .alias(f"nl{c}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("h") <= c, F.col("y"))
                .otherwise(0.0)
                .cast("decimal(38,18)")
            ).alias(f"sl{c}")
        )
    one = feat.agg(*aggs)
    splits = one.select(
        F.col("n"),
        F.col("s").cast("double").alias("sd"),
        F.col("q").cast("double").alias("qd"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.col(f"nl{c}").alias("nl"),
                        F.col(f"sl{c}").cast("double").alias("sl"),
                    )
                    for c in cands
                ]
            )
        ).alias("sp"),
    ).select(
        "n",
        "sd",
        "qd",
        F.col("sp.c").alias("c"),
        F.col("sp.nl").alias("nl"),
        F.col("sp.sl").alias("sl"),
    ).filter((F.col("nl") > 0) & (F.col("nl") < F.col("n")))
    sse = (
        F.col("qd")
        - (F.col("sl") * F.col("sl")) / F.col("nl").cast("double")
        - (
            (F.col("sd") - F.col("sl"))
            * (F.col("sd") - F.col("sl"))
        )
        / (F.col("n") - F.col("nl")).cast("double")
    )
    scored = splits.select(
        "n", "sd", "qd", "c", "nl", "sl", _fround(sse, 6).alias("sse")
    )
    wmin = Window.orderBy(F.col("sse").asc(), F.col("c").asc())
    best = (
        scored.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
    )
    return best.select(
        F.col("c").cast("int").alias("split_hour"),
        F.col("nl").cast("bigint").alias("n_left"),
        (F.col("n") - F.col("nl")).cast("bigint").alias("n_right"),
        _fround(F.col("sl") / F.col("nl").cast("double"), 4).alias(
            "mean_left"
        ),
        _fround(
            (F.col("sd") - F.col("sl"))
            / (F.col("n") - F.col("nl")).cast("double"),
            4,
        ).alias("mean_right"),
        _fround(
            (F.col("qd") - F.col("sd") * F.col("sd") / F.col("n").cast("double"))
            - F.col("sse"),
            4,
        ).alias("sse_reduction"),
    )


def q_gradient_boost_stumps(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 distributed gradient boosting (squared loss, 3 rounds,
    lr = 0.5): each round fits a depth-1 stump to the CURRENT
    residuals in one corpus pass (operators/ml.py::fit_stump — all
    candidate splits as generated conditional sums) and one more pass
    scores the updated ensemble's train SSE. The driver holds only
    the stump list (it IS the model); residual expressions carry the
    snapped split means as plan literals, so each pass is a plain
    aggregation over the cached feature relation. The DuckDB oracle
    unrolls the identical three rounds — 9-dp-snapped means and
    6-dp-snapped split scores keep both engines choosing the same
    splits. Monotone train-SSE across rounds is asserted in tests;
    this is the LightGBM-style boosting loop reduced to its Spark-
    native skeleton."""
    import math as _math

    from aproximacion_1_etl_spark.operators.ml import fit_stump

    ev = load_table(spark, sf_dir, "events")
    dp = spark.sparkContext.defaultParallelism
    feat = ev.select(
        F.col("value").alias("y"), F.hour("ts").cast("int").alias("h")
    ).repartition(dp).cache()
    try:
        base_row = feat.agg(
            F.count("*").alias("n"),
            F.sum(F.col("y").cast("decimal(38,18)")).alias("s"),
        ).collect()[0]
        f0 = (
            _math.floor(
                float(base_row["s"]) / int(base_row["n"]) * 1e9 + 0.5
            )
            / 1e9
        )
        lr = 0.5
        pred = F.lit(f0)
        rows = []
        for rnd in (1, 2, 3):
            resid = F.col("y") - pred
            st = fit_stump(feat, resid, "h")
            pred = pred + F.lit(lr) * F.when(
                F.col("h") <= st["c"], F.lit(st["mean_l"])
            ).otherwise(F.lit(st["mean_r"]))
            sse_row = feat.agg(
                F.sum(
                    ((F.col("y") - pred) * (F.col("y") - pred)).cast(
                        "decimal(38,18)"
                    )
                )
                .cast("double")
                .alias("sse")
            ).collect()[0]
            rows.append(
                (
                    rnd,
                    int(st["c"]),
                    _math.floor(st["mean_l"] * 1e4 + 0.5) / 1e4,
                    _math.floor(st["mean_r"] * 1e4 + 0.5) / 1e4,
                    _math.floor(float(sse_row["sse"]) * 1e2 + 0.5) / 1e2,
                )
            )
        return spark.createDataFrame(
            rows,
            "round int, split_hour int, mean_left double, "
            "mean_right double, train_sse double",
        )
    finally:
        feat.unpersist()


def q_ks_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 drift monitoring, exact flavor: per-source two-sample
    Kolmogorov-Smirnov statistic between the same hash-band corpus
    halves PSI uses — KS = sup |F_ref - F_cur|, computed exactly from
    cumulative fractions over the per-source ordered score sequence
    (one window partitioned by source; partitions are source-sized,
    never the corpus). PSI sees binned shape drift, KS the exact
    sup-norm — together they are the standard monitoring pair.
    Fractions are exact rational counts cast to double with identical
    expressions, and the statistic rounds to 6 dp."""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix
    from aproximacion_1_etl_spark.text.analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        "doc_id",
        (_hash_prefix(F.col("doc_id")) < "8000").alias("is_ref"),
        quality_score(F.col("text")).alias("score"),
    )
    tot = scored.groupBy("source").agg(
        F.sum(F.col("is_ref").cast("int")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("int")).alias("n_cur"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("score", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = scored.select(
        "source",
        F.sum(F.col("is_ref").cast("int")).over(w).alias("c_ref"),
        F.sum((~F.col("is_ref")).cast("int")).over(w).alias("c_cur"),
    )
    diffs = cum.join(F.broadcast(tot), "source").select(
        "source",
        F.abs(
            F.col("c_ref").cast("double") / F.col("n_ref").cast("double")
            - F.col("c_cur").cast("double") / F.col("n_cur").cast("double")
        ).alias("d"),
    )
    return diffs.groupBy("source").agg(
        _fround(F.max("d"), 6).alias("ks_stat")
    )


def q_als_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 matrix-factorization trainer, the ALS archetype at
    rank 1: implicit user x event-type counts factorize as
    r_ut ≈ u_u * v_t by alternating closed-form least squares. Per
    iteration the USER factor never materializes on the driver — it
    is a per-user aggregate expression over the ratings relation
    (v is the tiny side and rides as plan literals, |types| floats,
    snapped to 9 dp per iteration: it IS the model, the codebook
    rule); the item update is one co-partitioned join + two
    aggregations. 3 iterations, then one RMSE pass. The DuckDB oracle
    unrolls the identical alternation — decimal sums everywhere keep
    the recurrence engine-portable."""
    import math as _math

    ev = load_table(spark, sf_dir, "events")
    dp = spark.sparkContext.defaultParallelism
    ratings = (
        ev.groupBy(
            F.col("user_id").alias("u"), F.col("event_type").alias("t")
        )
        .agg(F.count("*").cast("double").alias("r"))
        .repartition(dp, F.col("u"))
        .cache()
    )
    try:
        types = sorted(
            r["t"] for r in ratings.select("t").distinct().collect()
        )
        v = {t: 1.0 for t in types}

        def snap9(x: float) -> float:
            return _math.floor(x * 1e9 + 0.5) / 1e9

        def v_expr(vd):
            expr = None
            for t, val in vd.items():
                c = F.when(F.col("t") == t, F.lit(val))
                expr = c if expr is None else expr.when(
                    F.col("t") == t, F.lit(val)
                )
            return expr.otherwise(F.lit(0.0))

        for _ in range(3):
            vv = sum(v[t] * v[t] for t in sorted(v))
            u_rel = ratings.groupBy("u").agg(
                (
                    F.sum((F.col("r") * v_expr(v)).cast("decimal(38,18)"))
                    .cast("double")
                    / F.lit(vv)
                ).alias("uf")
            )
            joined = ratings.join(u_rel, "u")
            vt = joined.groupBy("t").agg(
                F.sum((F.col("r") * F.col("uf")).cast("decimal(38,18)"))
                .cast("double")
                .alias("num")
            )
            uu = u_rel.agg(
                F.sum((F.col("uf") * F.col("uf")).cast("decimal(38,18)"))
                .cast("double")
                .alias("den")
            )
            rows = vt.crossJoin(F.broadcast(uu)).select(
                "t", (F.col("num") / F.col("den")).alias("vn")
            ).collect()
            v = {r["t"]: snap9(float(r["vn"])) for r in rows}
        vv = sum(v[t] * v[t] for t in sorted(v))
        u_rel = ratings.groupBy("u").agg(
            (
                F.sum((F.col("r") * v_expr(v)).cast("decimal(38,18)"))
                .cast("double")
                / F.lit(vv)
            ).alias("uf")
        )
        sse_row = (
            ratings.join(u_rel, "u")
            .select(
                (
                    (F.col("r") - F.col("uf") * v_expr(v))
                    * (F.col("r") - F.col("uf") * v_expr(v))
                ).alias("e2"),
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("e2").cast("decimal(38,18)"))
                .cast("double")
                .alias("sse"),
            )
            .collect()[0]
        )
        rmse = _math.floor(
            _math.sqrt(float(sse_row["sse"]) / int(sse_row["n"])) * 1e4
            + 0.5
        ) / 1e4
        out = [
            (t, _math.floor(v[t] * 1e4 + 0.5) / 1e4, rmse)
            for t in types
        ]
        return spark.createDataFrame(
            out, "event_type string, v_factor double, rmse double"
        )
    finally:
        ratings.unpersist()


def q_markov_prediction_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 sequence-model evaluation: resubstitution accuracy of
    the first-order Markov next-event predictor (argmax P(next|prev),
    the event_bigrams model) — per previous state: the predicted next
    type, transition count, and hit rate. One window pass builds
    transitions, one |types|²-bounded aggregation builds the model,
    and a broadcast join scores it; the argmax tiebreak
    (count desc, type asc) is deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    cm = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n")
    )
    wbest = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), F.col("next_type").asc()
    )
    model = (
        cm.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select("prev_type", F.col("next_type").alias("predicted_next"))
    )
    scored = pairs.join(F.broadcast(model), "prev_type")
    return scored.groupBy("prev_type", "predicted_next").agg(
        F.count("*").cast("bigint").alias("n_transitions"),
        _fround(
            F.sum(
                (F.col("next_type") == F.col("predicted_next")).cast(
                    "int"
                )
            ).cast("double")
            / F.count("*"),
            4,
        ).alias("accuracy"),
    )


def q_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 probability calibration: isotonic (PAV) regression of
    empirical accuracy on the model's score deciles — the standard
    post-hoc calibrator. Instead of the sequential pool-adjacent-
    violators loop, the fit uses the MINIMAX CLOSED FORM
    iso_i = max_{j<=i} min_{k>=i} wmean(y, j..k), which is pure
    relational algebra: weighted range means from prefix sums over
    the 10-row decile table (a 55-row range relation), then a min/max
    rollup — entirely in-plan, no driver arithmetic, no iteration.
    The corpus-sized work is the decile build (shared two-phase
    ranking); everything after is bounded by the bin grid. Calibrated
    values are monotone non-decreasing by construction (asserted)."""
    scored = _logreg_scored(spark, sf_dir)
    bucketed = scored.withColumn(
        "bkt", F.least(F.floor(F.col("p") * 1000).cast("int"), F.lit(999))
    )
    boff = (
        bucketed.groupBy("bkt")
        .agg(F.count("*").alias("bn"))
        .select(
            "bkt",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    wb = Window.partitionBy("bkt").orderBy("p", "vec_id")
    ranked = (
        bucketed.withColumn("rb", F.row_number().over(wb))
        .join(boff, "bkt")
        .select("y", "p", (F.col("off") + F.col("rb")).alias("r"))
    )
    n_tot = scored.agg(F.count("*").alias("n_all"))
    deciles = (
        ranked.crossJoin(F.broadcast(n_tot))
        .select(
            "y",
            "p",
            F.expr("CAST(((r - 1) * 10) div n_all AS INT)").alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_b"),
            F.sum(F.col("p").cast("decimal(38,18)"))
            .cast("double")
            .alias("sp"),
            F.sum(F.col("y").cast("decimal(38,18)"))
            .cast("double")
            .alias("sy"),
        )
    )
    # prefix sums over the ordered bins -> weighted range means
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = deciles.select(
        "bin",
        "n_b",
        "sp",
        "sy",
        F.sum("n_b").over(wcum).alias("cn"),
        F.sum(F.col("sy").cast("decimal(38,18)"))
        .over(wcum)
        .cast("double")
        .alias("cy"),
    )
    lo = pre.select(
        F.col("bin").alias("j"),
        (F.col("cn") - F.col("n_b")).alias("cn_lo"),
        (
            F.col("cy")
            - F.col("sy")
        ).alias("cy_lo"),
    )
    hi = pre.select(
        F.col("bin").alias("k"),
        F.col("cn").alias("cn_hi"),
        F.col("cy").alias("cy_hi"),
    )
    ranges = lo.crossJoin(hi).filter(F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("cy_hi") - F.col("cy_lo"))
            / (F.col("cn_hi") - F.col("cn_lo")).cast("double")
        ).alias("wmean"),
    )
    bins = deciles.select("bin", "n_b", "sp", "sy")
    cand = bins.crossJoin(ranges).filter(
        (F.col("j") <= F.col("bin")) & (F.col("k") >= F.col("bin"))
    )
    inner = cand.groupBy("bin", "n_b", "sp", "sy", "j").agg(
        F.min("wmean").alias("mn")
    )
    iso = inner.groupBy("bin", "n_b", "sp", "sy").agg(
        F.max("mn").alias("iso_raw")
    )
    return iso.select(
        "bin",
        "n_b",
        _fround(F.col("sp") / F.col("n_b"), 4).alias("confidence"),
        _fround(F.col("sy") / F.col("n_b"), 4).alias("accuracy"),
        _fround(F.col("iso_raw"), 4).alias("calibrated"),
    )


def q_drift_fdr_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 multiple-testing control for drift monitoring: per-source
    KS statistics (the ks_drift_report computation) converted to
    asymptotic two-sample p-values (Kolmogorov series, 5 terms —
    deterministic exp arithmetic, 9-dp snapped before any compare)
    and screened by Benjamini-Hochberg at FDR alpha = 0.1 — the
    correct way to alarm on hundreds of per-source drift tests
    without drowning in false positives. The BH step-up is two
    windows over the |sources| relation: the p-ascending rank, and
    the max qualifying rank broadcast back as the rejection frontier."""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix
    from aproximacion_1_etl_spark.text.analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        "doc_id",
        (_hash_prefix(F.col("doc_id")) < "8000").alias("is_ref"),
        quality_score(F.col("text")).alias("score"),
    )
    tot = scored.groupBy("source").agg(
        F.sum(F.col("is_ref").cast("int")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("int")).alias("n_cur"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("score", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = scored.select(
        "source",
        F.sum(F.col("is_ref").cast("int")).over(w).alias("c_ref"),
        F.sum((~F.col("is_ref")).cast("int")).over(w).alias("c_cur"),
    )
    ks = (
        cum.join(F.broadcast(tot), "source")
        .select(
            "source",
            "n_ref",
            "n_cur",
            F.abs(
                F.col("c_ref").cast("double")
                / F.col("n_ref").cast("double")
                - F.col("c_cur").cast("double")
                / F.col("n_cur").cast("double")
            ).alias("d"),
        )
        .groupBy("source", "n_ref", "n_cur")
        .agg(F.max("d").alias("ks"))
    )
    lam = F.col("ks") * F.sqrt(
        F.col("n_ref").cast("double")
        * F.col("n_cur").cast("double")
        / (F.col("n_ref") + F.col("n_cur")).cast("double")
    )
    series = None
    for j in range(1, 6):
        term = F.lit(float((-1) ** (j - 1)) * 2.0) * F.exp(
            F.lit(-2.0 * j * j) * lam * lam
        )
        series = term if series is None else series + term
    pval = F.least(
        F.greatest(
            F.floor(series * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    tested = ks.select(
        "source", _fround(F.col("ks"), 6).alias("ks_stat"),
        pval.alias("p9"),
    )
    wr = Window.orderBy(F.col("p9").asc(), F.col("source").asc())
    ranked = tested.withColumn("rank", F.row_number().over(wr))
    m = ranked.agg(F.count("*").alias("m"))
    flagged = ranked.crossJoin(F.broadcast(m)).withColumn(
        "qual",
        F.when(
            F.col("p9")
            <= F.col("rank").cast("double")
            * F.lit(0.1)
            / F.col("m").cast("double"),
            F.col("rank"),
        ).otherwise(F.lit(0)),
    )
    kmax = flagged.agg(F.max("qual").alias("kmax"))
    return (
        flagged.crossJoin(F.broadcast(kmax))
        .select(
            "source",
            "ks_stat",
            _fround(F.col("p9"), 6).alias("p_value"),
            F.col("rank").cast("bigint").alias("rank"),
            (F.col("rank") <= F.col("kmax")).cast("int").alias(
                "drift_flagged"
            ),
        )
    )


def q_score_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 filter-design analysis: Pearson correlation between the
    two per-document quality signals the pipeline computes (the
    rule-based quality score and length in characters) — redundant
    filters waste compute and bias the corpus, so the correlation
    matrix between candidate signals is what decides which filters to
    keep. One aggregation of exact decimal moment sums; r from the
    product-moment identity with identical IEEE arithmetic on both
    engines."""
    from aproximacion_1_etl_spark.text.analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    xy = docs.select(
        quality_score(F.col("text")).alias("x"),
        F.col("n_chars").cast("double").alias("y"),
    )
    agg = xy.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,18)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,18)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,18)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    r = (F.col("sxy") - F.col("sx") * F.col("sy") / nd) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / nd)
        * (F.col("syy") - F.col("sy") * F.col("sy") / nd)
    )
    return agg.select("n", _fround(r, 6).alias("pearson_r"))


def q_vocab_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 corpus-diversity metric: Gini coefficient of the token
    frequency distribution per language — a high Gini means a few
    tokens dominate (template/boilerplate-heavy text), a key
    diversity signal next to entropy. Exact rank formula
    G = 2 * sum(i * x_(i)) / (n * sum(x)) - (n + 1) / n over the
    per-language count-ascending ranking (ordered per-lang windows,
    partitions bounded by per-language vocabulary); sums in decimal."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    counts = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    wl = Window.partitionBy("lang").orderBy(
        F.col("c").asc(), F.col("tok").asc()
    )
    ranked = counts.withColumn("i", F.row_number().over(wl))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("vocab"),
            F.sum(F.col("c").cast("decimal(38,18)"))
            .cast("double")
            .alias("total"),
            F.sum((F.col("i") * F.col("c")).cast("decimal(38,18)"))
            .cast("double")
            .alias("ic"),
        )
        .select(
            "lang",
            "vocab",
            _fround(
                F.lit(2.0)
                * F.col("ic")
                / (F.col("vocab").cast("double") * F.col("total"))
                - (F.col("vocab") + F.lit(1)).cast("double")
                / F.col("vocab").cast("double"),
                6,
            ).alias("gini"),
        )
    )


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 fraud/DQ screening: Benford first-digit audit of order
    totals — observed leading-digit frequencies vs the Benford
    expectation log10(1 + 1/d), with each digit's chi-square
    contribution. Synthetic or fabricated monetary data drifts from
    Benford; the per-digit contributions localize WHERE. One
    aggregation to a 9-row relation; the leading digit is extracted
    arithmetically (digit of |x| shifted into [1, 10) by a log10
    floor), identically on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    x = F.abs(F.col("o_totalprice"))
    lead = F.floor(
        x / F.pow(F.lit(10.0), F.floor(F.log10(x)))
    ).cast("int")
    digits = orders.filter(x > 0).select(lead.alias("d"))
    per = digits.groupBy("d").agg(F.count("*").cast("bigint").alias("n"))
    tot = per.agg(F.sum("n").alias("n_all"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d").cast("double"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            _fround(
                F.col("n").cast("double") / F.col("n_all").cast("double"),
                6,
            ).alias("observed_freq"),
            _fround(expected, 6).alias("benford_freq"),
            _fround(
                (
                    F.col("n").cast("double")
                    - F.col("n_all").cast("double") * expected
                )
                * (
                    F.col("n").cast("double")
                    - F.col("n_all").cast("double") * expected
                )
                / (F.col("n_all").cast("double") * expected),
                4,
            ).alias("chi2_contrib"),
        )
    )


def q_spearman_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 filter-design analysis, rank flavor: Spearman rho
    between the quality score and document length — the robust
    companion to score_correlation's Pearson r (monotone association,
    immune to the length tail). Average ranks over ties for BOTH
    variables via the model_auc pattern (bucketed two-phase global
    rank + per-value min/max averaging), then one Pearson moment
    aggregation over the rank pairs. No single-task global sort:
    both rankings ride the 1000-cell grid prefix sums."""
    from aproximacion_1_etl_spark.text.analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        quality_score(F.col("text")).alias("x"),
        F.col("n_chars").cast("double").alias("y"),
    )

    def avg_rank(df, col, out):
        mx = df.agg(
            F.max(F.col(col)).alias("mx"), F.min(F.col(col)).alias("mn")
        )
        b = df.crossJoin(F.broadcast(mx)).withColumn(
            "bkt",
            F.least(
                F.floor(
                    (F.col(col) - F.col("mn"))
                    / (F.col("mx") - F.col("mn") + F.lit(1e-12))
                    * 1000
                ).cast("int"),
                F.lit(999),
            ),
        )
        boff = (
            b.groupBy("bkt")
            .agg(F.count("*").alias("bn"))
            .select(
                "bkt",
                F.coalesce(
                    F.sum("bn").over(
                        Window.orderBy("bkt").rowsBetween(
                            Window.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0),
                ).alias("off"),
            )
        )
        wb = Window.partitionBy("bkt").orderBy(col, "doc_id")
        ranked = (
            b.withColumn("rb", F.row_number().over(wb))
            .join(boff, "bkt")
            .withColumn("r", F.col("off") + F.col("rb"))
        )
        wg = Window.partitionBy(col)
        return ranked.select(
            "doc_id",
            (
                (F.min("r").over(wg) + F.max("r").over(wg)).cast(
                    "double"
                )
                / F.lit(2.0)
            ).alias(out),
        )
    rx = avg_rank(base, "x", "rx")
    ry = avg_rank(base, "y", "ry")
    pairs = rx.join(ry, "doc_id")
    agg = pairs.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("rx").cast("decimal(38,18)")).cast("double").alias("sx"),
        F.sum(F.col("ry").cast("decimal(38,18)")).cast("double").alias("sy"),
        F.sum((F.col("rx") * F.col("rx")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("ry") * F.col("ry")).cast("decimal(38,18)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("rx") * F.col("ry")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    rho = (F.col("sxy") - F.col("sx") * F.col("sy") / nd) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / nd)
        * (F.col("syy") - F.col("sy") * F.col("sy") / nd)
    )
    return agg.select("n", _fround(rho, 6).alias("spearman_rho"))


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


def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 extension — per-brand Pareto frontier of parts trading off
    price (minimize) against size (maximize). Bucket-pruned one-pass
    skyline (operators/skyline.py) — dedup to distinct pairs, window
    per (brand, price-bucket), cross-bucket prune on the bucket
    summary; the oracle is the quadratic NOT EXISTS dominance test the
    operator avoids.
    """
    from aproximacion_1_etl_spark.operators.skyline import pareto_frontier_2d

    p = load_table(spark, sf_dir, "part")
    front = pareto_frontier_2d(
        p, minimize="p_retailprice", maximize="p_size", by=["p_brand"]
    )
    return front.select(
        "p_brand",
        _fround(F.col("p_retailprice"), 2).alias("price"),
        F.col("p_size").cast("int").alias("size"),
        F.col("n_rows").cast("bigint").alias("n_parts"),
    )


def q_skyline_pareto_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 extension — k-D (here 3-D) Pareto frontier per part type:
    minimize price, maximize size AND name length (the stand-in third
    attribute on the catalog-shaped part table). Grid skyline
    (operators/skyline.py::pareto_frontier_kd): equi-depth bucket every
    dimension, prune whole grid cells dominated cell-vs-cell, run the
    quadratic dominance kernel only inside surviving cells, then over
    the frontier-sized candidate union — never over the raw relation.
    The oracle is the all-pairs NOT EXISTS the operator avoids."""
    from aproximacion_1_etl_spark.operators.skyline import pareto_frontier_kd

    p = load_table(spark, sf_dir, "part").select(
        "p_type",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("int").alias("size"),
        F.length("p_name").cast("int").alias("name_len"),
    )
    front = pareto_frontier_kd(
        p,
        minimize=["price"],
        maximize=["size", "name_len"],
        by=["p_type"],
    )
    return front.select(
        "p_type",
        _fround(F.col("price"), 2).alias("price"),
        F.col("size").cast("int").alias("size"),
        F.col("name_len").cast("int").alias("name_len"),
        F.col("n_rows").cast("bigint").alias("n_parts"),
    )


def q_incremental_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6/§2.10 extension — INCREMENTAL Pareto frontier: the skyline
    is a mergeable state (frontier(A ∪ B) = frontier(frontier(A) ∪
    frontier(B)) — a point dominated inside a batch is dominated by a
    batch-mate that itself reaches the union), so a daily catalog drop
    folds into the standing frontier at O(batch + |frontier|) with no
    history rescan — the same state-outlives-the-batch shape as the
    profile and dedup stores. Three deterministic part-table batches
    each compute a local 3-D frontier; the merge re-frontiers the
    union of partials with counts SUMMED per tuple (a tuple on the
    final frontier survives every batch it appears in, so its partial
    counts must add). The oracle is the all-pairs NOT EXISTS over the
    FULL table — merged must equal recomputed."""
    from aproximacion_1_etl_spark.operators.skyline import pareto_frontier_kd

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_type",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("int").alias("size"),
        F.length("p_name").cast("int").alias("name_len"),
    )
    partials = [
        pareto_frontier_kd(
            p.filter(F.col("p_partkey") % 3 == i),
            minimize=["price"],
            maximize=["size", "name_len"],
            by=["p_type"],
        )
        for i in range(3)
    ]
    u = partials[0]
    for f in partials[1:]:
        u = u.unionByName(f)
    front = pareto_frontier_kd(
        u,
        minimize=["price"],
        maximize=["size", "name_len"],
        by=["p_type"],
        weight_col="n_rows",
    )
    return front.select(
        "p_type",
        _fround(F.col("price"), 2).alias("price"),
        F.col("size").cast("int").alias("size"),
        F.col("name_len").cast("int").alias("name_len"),
        F.col("n_rows").cast("bigint").alias("n_parts"),
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


def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-grade join-cardinality diagnostic: for each candidate
    join, the textbook uniform-NDV estimate |R|x|S|/max(ndv_R, ndv_S)
    next to the EXACT output size — computed without materializing the
    join (sum of per-key count products, one aggregate per side + a
    key-count join, so the "actual" costs two shuffled aggregates on
    keys, never |R join S| rows). The FK joins estimate exactly; the
    many-many nation join shows the uniformity error a real optimizer
    carries into its plan choice — the number AQE's runtime stats are
    there to correct.
    """

    def one(name, left, lk, right, rk):
        ls = left.agg(
            F.count("*").alias("n_left"),
            F.count_distinct(F.col(lk)).alias("ndv_left"),
        )
        rs = right.agg(
            F.count("*").alias("n_right"),
            F.count_distinct(F.col(rk)).alias("ndv_right"),
        )
        cl = left.groupBy(F.col(lk).alias("k")).agg(F.count("*").alias("cl"))
        cr = right.groupBy(F.col(rk).alias("k")).agg(F.count("*").alias("cr"))
        actual = cl.join(cr, "k").agg(
            F.sum(F.col("cl") * F.col("cr")).alias("actual_rows")
        )
        est = F.floor(
            F.col("n_left").cast("double")
            * F.col("n_right").cast("double")
            / F.greatest("ndv_left", "ndv_right").cast("double")
        ).cast("bigint")
        return (
            ls.crossJoin(F.broadcast(rs))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(name).alias("join_name"),
                F.col("n_left").cast("bigint").alias("n_left"),
                F.col("n_right").cast("bigint").alias("n_right"),
                F.col("ndv_left").cast("bigint").alias("ndv_left"),
                F.col("ndv_right").cast("bigint").alias("ndv_right"),
                est.alias("est_rows"),
                F.col("actual_rows").cast("bigint").alias("actual_rows"),
                _fround(
                    (est.cast("double") - F.col("actual_rows"))
                    / F.col("actual_rows")
                    * 100.0,
                    2,
                ).alias("err_pct"),
            )
        )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        one("orders_lineitem", o, "o_orderkey", li, "l_orderkey")
        .unionByName(one("customer_orders", c, "c_custkey", o, "o_custkey"))
        .unionByName(
            one("customer_supplier_nation", c, "c_nationkey", s, "s_nationkey")
        )
    )


def _hll_trailing_report(daily: DataFrame, ev_day: DataFrame) -> DataFrame:
    """THE trailing-7-day render shared by the batch and streaming
    daily-sketch keys (their oracles are aliased to the same SQL, so
    the Spark sides must be one definition too — the _hist_bucket
    principle): ``daily`` is the sketch state (event_type, day, sk),
    ``ev_day`` the raw (event_type, day, user_id) facts used ONLY for
    the driver-checkable exact side. Estimate = hll_union_agg over a
    RANGE window of <= 7 sketch rows; est_ok asserts the estimate is
    within max(2, 5%) of exact."""
    d = daily.withColumn(
        "d_num", F.datediff("day", F.lit("1970-01-01").cast("date"))
    )
    w7 = Window.partitionBy("event_type").orderBy("d_num").rangeBetween(-6, 0)
    est = d.select(
        "event_type",
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w7)).alias("est"),
    )
    # exact side — verification only; a production run emits `est`
    exact = (
        d.select("event_type", "day")
        .alias("d")
        .join(
            ev_day.alias("e"),
            (F.col("e.event_type") == F.col("d.event_type"))
            & (
                F.col("e.day").between(
                    F.date_sub(F.col("d.day"), 6), F.col("d.day")
                )
            ),
        )
        .groupBy(
            F.col("d.event_type").alias("event_type"),
            F.col("d.day").alias("day"),
        )
        .agg(F.countDistinct("e.user_id").alias("n_exact"))
    )
    return est.join(exact, ["event_type", "day"]).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.greatest(F.lit(2.0), F.lit(0.05) * F.col("n_exact"))
        ).alias("est_ok"),
    )


def q_hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 sliding-window distinct counts from MERGED DAILY SKETCH
    PARTIALS: per-(event_type, day) HyperLogLog sketches over user_id,
    then a 7-day trailing distinct-user estimate per day computed by
    union-merging at most 7 of those sketches in a RANGE window —
    never re-scanning raw events per window position. This is the 100
    TB shape of "rolling 7-day active users": the persisted artifact
    is |types|x|days| sketch rows (~4 KB each); each new day costs one
    partial over that day's events plus a 7-sketch merge, where the
    naive form re-scans a week of raw facts per day. Like
    hll_sketch_union, the hashed output carries the EXACT trailing
    distinct count (computed here only so the accuracy claim is
    driver-checkable) plus a boolean asserting the sketch estimate is
    within max(2, 5%) of it."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return _hll_trailing_report(daily, ev)


def q_segment_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 pairwise audience overlap between segments via
    INCLUSION-EXCLUSION ON SKETCHES: one HLL sketch of user_id per
    event_type segment, then |A∩B| ≈ est(A) + est(B) - est(A∪B) with
    the union estimated by the binary ``hll_union`` of the two stored
    sketches. The all-pairs overlap matrix costs a |segments|²
    sketch-level join (tiny rows) — the raw facts are scanned ONCE to
    build the sketches, where the naive form re-joins the fact table
    per pair. The exact per-pair intersection/Jaccard (a distinct
    self-join) is computed here only so the accuracy claim is
    driver-checkable; est_ok asserts the sketch-derived intersection
    is within max(3, 5% of the exact union) — the I-E error compounds
    three estimates, each bounded by the union's cardinality."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    seg = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_seg"),
    )
    pairs = (
        seg.alias("a")
        .join(
            F.broadcast(seg.alias("b")),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.n_seg").cast("bigint").alias("n_a"),
            F.col("b.n_seg").cast("bigint").alias("n_b"),
            (
                F.hll_sketch_estimate("a.sk")
                + F.hll_sketch_estimate("b.sk")
                - F.hll_sketch_estimate(F.hll_union("a.sk", "b.sk"))
            ).alias("est_inter"),
        )
    )
    du = ev.distinct()
    inter = (
        du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    n_union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return pairs.join(inter, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_inter",
        _fround(F.col("n_inter") / n_union.cast("double"), 4).alias(
            "jaccard"
        ),
        (
            F.abs(F.col("est_inter") - F.col("n_inter"))
            <= F.greatest(F.lit(3.0), F.lit(0.05) * n_union)
        ).alias("est_ok"),
    )


def _customer_cdc_waves(c: DataFrame) -> tuple[DataFrame, DataFrame]:
    """THE two customer CDC delta batches shared by merge_on_read and
    streaming_merge_on_read (whose oracle is aliased to the same SQL —
    the constants below are hard-coded there, so exactly one Spark-side
    definition may exist): wave 1 bumps nation-5 balances 10%; wave 2
    deletes the %97 key slice (minus rows it re-upserts — batches are
    key-unique) and re-zeroes the nation-5 %3 sub-segment. Both carry
    an ``op`` column ('U'/'D')."""
    w1 = c.filter(F.col("c_nationkey") == 5).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") * F.lit(1.1)).alias("c_acctbal"),
        F.lit("U").alias("op"),
    )
    reup = (F.col("c_nationkey") == 5) & (F.col("c_custkey") % 3 == 0)
    w2 = (
        c.filter((F.col("c_custkey") % 97 == 0) & ~reup)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_acctbal",
            F.lit("D").alias("op"),
        )
        .unionByName(
            c.filter(reup).select(
                "c_custkey",
                "c_name",
                "c_nationkey",
                F.lit(-1.0).alias("c_acctbal"),
                F.lit("U").alias("op"),
            )
        )
    )
    return w1, w2


def q_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read scan over a snapshot table with accumulated delta
    batches (sources/versioned.py::write_delta/read_merged): the
    customer base version plus two delta sequences — seq 0 upserts a
    segment's new balances, seq 1 both deletes a key slice AND
    re-updates part of the seq-0 segment — read back as ONE logical
    relation with highest-sequence-wins semantics, no base file
    rewritten. The read plan never shuffles the base: winning delta
    images resolve in a window over the tiny delta set, their keys
    broadcast into a left-anti prune, after-images unioned on top —
    read cost is base-scan + broadcast, independent of delta count.
    The oracle replays the same precedence as CASE/WHERE over the raw
    table."""
    import shutil

    from aproximacion_1_etl_spark.sources.versioned import (
        read_merged,
        write_delta,
        write_snapshot,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    base = tempfile.mkdtemp(prefix="graft_mor_")
    path = os.path.join(base, "customer")
    try:
        write_snapshot(c, path)
        w1, w2 = _customer_cdc_waves(c)
        write_delta(w1, path, op_col="op")
        write_delta(w2, path, op_col="op")
        out = read_merged(spark, path, ["c_custkey"]).select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            _fround(F.col("c_acctbal"), 2).alias("c_acctbal"),
        )
        return _reclaimed_dist(out, base)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)


def q_gated_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-gated snapshot publish (sources/versioned.py::
    write_snapshot_gated): a batch with a known defect (orderkeys
    divisible by 50 flagged as synthetic 'bad' rows) is offered under
    three named expectations evaluated in ONE aggregation pass; the
    violated rule blocks the manifest flip, so NOTHING becomes visible
    and the table stays at its last good version — then the cleaned
    batch passes and commits. Emits the audit trail a daily loop
    would log: per-rule violation counts for both attempts plus the
    committed-version outcome. The reference's loop
    (`app.py:142-147`) diffs runs only AFTER bad data is live; the
    gate moves the check before the commit point."""
    import shutil

    from aproximacion_1_etl_spark.sources.versioned import (
        current_version,
        write_snapshot_gated,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    rules = {
        "positive_price": "o_totalprice > 0",
        "key_present": "o_orderkey IS NOT NULL",
        "no_synthetic_keys": "o_orderkey % 50 != 0",
    }
    base = tempfile.mkdtemp(prefix="graft_gate_")
    path = os.path.join(base, "orders")
    try:
        v_bad, viol_bad = write_snapshot_gated(o, path, rules)
        cleaned = o.filter(F.col("o_orderkey") % 50 != 0)
        v_ok, viol_ok = write_snapshot_gated(cleaned, path, rules)
        after = current_version(path)
        rows = [
            ("attempt_bad", name, viol_bad[name], v_bad is not None)
            for name in sorted(rules)
        ] + [
            ("attempt_clean", name, viol_ok[name], v_ok is not None)
            for name in sorted(rules)
        ]
        out = spark.createDataFrame(
            [
                (a, r, int(n), bool(p), int(after if after is not None else -1))
                for a, r, n, p in rows
            ],
            "attempt STRING, rule STRING, n_violations BIGINT, "
            "published BOOLEAN, version_after INT",
        )
        return out
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)


def q_snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across snapshot versions (sources/
    versioned.py::read_history): v0 of the customer table lacks
    c_mktsegment, v1 adds it; the full-history scan aligns columns BY
    NAME so v0 rows read the new column as NULL — no backfill rewrite
    of the old version. Emits the per-version audit (row count, nulls
    in the evolved column, distinct segments) a migration review
    needs. One scan per version, no shuffle in the union; the
    audit aggregate is |versions x segments|-sized."""
    import shutil

    from aproximacion_1_etl_spark.sources.versioned import (
        read_history,
        write_snapshot,
    )

    c = load_table(spark, sf_dir, "customer")
    base = tempfile.mkdtemp(prefix="graft_evo_")
    path = os.path.join(base, "customer")
    try:
        write_snapshot(
            c.select("c_custkey", "c_name", "c_acctbal"), path
        )
        write_snapshot(
            c.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment"),
            path,
        )
        hist = read_history(spark, path)
        out = (
            hist.groupBy("_v")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.when(F.col("c_mktsegment").isNull(), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("n_null_segment"),
                F.countDistinct("c_mktsegment")
                .cast("bigint")
                .alias("n_segments"),
            )
            .select(
                F.col("_v").cast("int").alias("version"),
                "n_rows",
                "n_null_segment",
                "n_segments",
            )
        )
        # bounded: |versions| rows — safe to materialize for reclaim
        return _reclaimed(out, base)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)


def q_snapshot_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version blame over the committed chain: orders land in three
    cumulative snapshot versions (pre-1997, pre-1999, all), and for
    every key the FIRST version containing it is derived from the
    full-history scan with one min(_v) aggregate — per-row provenance
    with zero producer-side instrumentation. Emits the per-version
    introduction profile (keys introduced, their value sum). At long
    retention a deployment stores _v at write time; deriving it costs
    one scan per version, which is exactly what the docstring of
    read_history prescribes bounding via time travel."""
    import shutil

    from aproximacion_1_etl_spark.sources.versioned import (
        read_history,
        write_snapshot,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    base = tempfile.mkdtemp(prefix="graft_blame_")
    path = os.path.join(base, "orders")
    try:
        write_snapshot(o.filter(F.col("o_orderdate") < "1997-01-01"), path)
        write_snapshot(o.filter(F.col("o_orderdate") < "1999-01-01"), path)
        write_snapshot(o, path)
        first = (
            read_history(spark, path)
            .groupBy("o_orderkey")
            .agg(
                F.min("_v").alias("first_version"),
                # the image AT the first version (min_by _v), not an
                # arbitrary version's — identical across versions in
                # this fixture, but the contract is "value introduced"
                F.min_by("o_totalprice", "_v").alias("o_totalprice"),
            )
        )
        out = (
            first.groupBy("first_version")
            .agg(
                F.count("*").cast("bigint").alias("n_keys"),
                _dsum(F.col("o_totalprice")).alias("value_introduced"),
            )
            .select(
                F.col("first_version").cast("int").alias("first_version"),
                "n_keys",
                "value_introduced",
            )
        )
        return _reclaimed(out, base)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)


def q_streaming_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + §2.1: the merge-on-read table MAINTAINED BY A STREAM —
    CDC micro-batches land as delta appends (write_delta) against the
    customer base snapshot, never rewriting a base file; the final
    merged read must equal the batch merge_on_read key's oracle
    exactly. Replay-idempotent: each micro-batch travels with its
    batch id as delta meta (committed_delta_metas), so a recovered
    stream that re-delivers the in-flight batch skips it — delta
    append is NOT idempotent by itself (a duplicate batch would raise
    the winning sequence with identical content today, but a
    non-deterministic producer would double-apply). Per-batch cost =
    the delta write alone (kilobytes); the base relation is only ever
    scanned at read time."""
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.sources.versioned import (
        committed_delta_metas,
        current_version,
        read_merged,
        write_delta,
        write_snapshot,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        "c_acctbal",
    )
    base = tempfile.mkdtemp(prefix="graft_smor_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_smor_")
    src = os.path.join(base, "cdc")
    path = os.path.join(base, "customer")

    def handle_batch(batch, batch_id: int) -> None:
        v = current_version(path)
        if v is not None and str(batch_id) in committed_delta_metas(
            path, v
        ):
            return
        write_delta(batch, path, op_col="op", meta=str(batch_id))

    try:
        write_snapshot(c, path)
        w1, w2 = _customer_cdc_waves(c)
        w1.coalesce(1).write.parquet(os.path.join(src, "w1"))
        w2.coalesce(1).write.parquet(os.path.join(src, "w2"))
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        q = (
            spark.readStream.schema(
                "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
                "c_acctbal DOUBLE, op STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        out = read_merged(spark, path, ["c_custkey"]).select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            _fround(F.col("c_acctbal"), 2).alias("c_acctbal"),
        )
        return _reclaimed_dist(out, base, ckpt)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def q_streaming_hll_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + §2.6: the daily-sketch table MAINTAINED BY A STREAM —
    each micro-batch folds its own per-(type, day) HLL partials into
    the persisted sketch state with hll_union_agg (sketches are
    binary, parquet-stored, mergeable across batches: the wave cut is
    mid-DAY, so one day's sketch is genuinely assembled from two
    batches' partials). The final 7-day trailing distinct render from
    the folded state meets the same max(2, 5%) bound against exact as
    hll_sliding_distinct — identical oracle by construction.
    Replay-idempotent via commit-carried batch ids (sketch fold, like
    the count fold, is NOT idempotent... union of the same sketch IS,
    but a recovered stream may re-deliver a RESHAPED batch; the guard
    makes the question moot). Per-batch cost O(|batch| + |state|);
    the raw facts are never rescanned."""
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.sources.versioned import (
        committed_metas,
        current_version,
        read_snapshot,
        write_snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts"), "user_id"
    )
    base = tempfile.mkdtemp(prefix="graft_shll_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_shll_")
    src = os.path.join(base, "src")
    state_log = os.path.join(base, "state")

    def handle_batch(batch, batch_id: int) -> None:
        if str(batch_id) in committed_metas(state_log):
            return
        bspark = batch.sparkSession
        part = batch.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(F.hll_sketch_agg("user_id").alias("sk"))
        if current_version(state_log) is not None:
            prior = read_snapshot(bspark, state_log)
            part = (
                prior.unionByName(part)
                .groupBy("event_type", "day")
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
        write_snapshot(part, state_log, meta=str(batch_id))

    try:
        # mid-DAY cut: day 16's sketch must merge across two batches
        cut = "2024-01-16 12:00:00"
        ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(
            os.path.join(src, "w1")
        )
        ev.filter(F.col("ts") >= cut).coalesce(1).write.parquet(
            os.path.join(src, "w2")
        )
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        q = (
            spark.readStream.schema(
                "event_type STRING, ts TIMESTAMP, user_id BIGINT"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

        daily = read_snapshot(spark, state_log)
        evd = ev.select(
            "event_type", F.to_date("ts").alias("day"), "user_id"
        )
        out = _hll_trailing_report(daily, evd)
        return _reclaimed(out, base, ckpt)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def q_cdf_to_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 DERIVED FROM VERSION HISTORY (sources/versioned.py::
    history_to_scd2): orders land in three cumulative snapshot
    versions with price revisions between them (5% bump for %7 keys at
    v1, 10% cut for %11 keys at v2); the full-history scan + two
    windows reconstruct each key's validity intervals
    [valid_from, valid_to) in version numbers with the open current
    interval flagged — the instrumented SCD2 builder's output for
    tables that only ever kept snapshots. The oracle replays the
    version lattice as CASE arithmetic and the same change-point
    windows."""
    import shutil

    from aproximacion_1_etl_spark.sources.versioned import (
        history_to_scd2,
        read_history,
        write_snapshot,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    k = F.col("o_orderkey")
    base = tempfile.mkdtemp(prefix="graft_scd2v_")
    path = os.path.join(base, "orders")
    try:
        write_snapshot(
            o.filter(F.col("o_orderdate") < "1997-01-01").drop(
                "o_orderdate"
            ),
            path,
        )
        write_snapshot(
            o.filter(F.col("o_orderdate") < "1999-01-01")
            .withColumn(
                "o_totalprice",
                F.when(k % 7 == 0, F.col("o_totalprice") * 1.05).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .drop("o_orderdate"),
            path,
        )
        write_snapshot(
            o.withColumn(
                "o_totalprice",
                F.when(k % 11 == 0, F.col("o_totalprice") * 0.9)
                .when(k % 7 == 0, F.col("o_totalprice") * 1.05)
                .otherwise(F.col("o_totalprice")),
            ).drop("o_orderdate"),
            path,
        )
        scd2 = history_to_scd2(
            read_history(spark, path), ["o_orderkey"], ["o_totalprice"]
        )
        out = scd2.select(
            "o_orderkey",
            F.col("valid_from").cast("int").alias("valid_from"),
            F.coalesce(F.col("valid_to"), F.lit(-1))
            .cast("int")
            .alias("valid_to"),
            _fround(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "is_current",
        )
        return _reclaimed_dist(out, base)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)


def q_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (§2.10 profiling depth): for
    each candidate pair A -> B, one keyed aggregation counts the
    A-groups whose B is not unique and the total surplus images —
    FD holds iff no group carries two distinct consequents. The DQ
    check behind merge-key and natural-key validation
    (`Composer/DAG_cloudrun_dataflow_sp.py` trusts its SP merge keys
    blindly; this measures them first). One groupBy per pair (each
    map-side combinable); nothing is joined."""
    checks = [
        ("orders", "o_orderkey", "o_custkey"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("orders", "o_orderdate", "o_orderstatus"),
        ("customer", "c_custkey", "c_nationkey"),
        ("customer", "c_nationkey", "c_mktsegment"),
    ]
    outs = []
    for tbl, a, b in checks:
        df = load_table(spark, sf_dir, tbl)
        g = (
            df.groupBy(a)
            .agg(F.countDistinct(b).alias("ndv"))
            .agg(
                F.count("*").alias("n_groups"),
                F.sum(F.when(F.col("ndv") > 1, 1).otherwise(0)).alias(
                    "n_violating_groups"
                ),
                F.sum(F.col("ndv") - 1).alias("n_surplus_images"),
            )
            .select(
                F.lit(f"{tbl}.{a}").alias("antecedent"),
                F.lit(f"{tbl}.{b}").alias("consequent"),
                F.col("n_groups").cast("bigint").alias("n_groups"),
                F.col("n_violating_groups")
                .cast("bigint")
                .alias("n_violating_groups"),
                F.col("n_surplus_images")
                .cast("bigint")
                .alias("n_surplus_images"),
                (F.col("n_violating_groups") == 0).alias("fd_holds"),
            )
        )
        outs.append(g)
    out = outs[0]
    for g in outs[1:]:
        out = out.unionByName(g)
    return out


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


def q_dq_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality metrics PIGGYBACKED ON THE PRODUCTION ACTION via
    Spark's Observation API: the audit aggregates (row count, null
    rate, domain violations, value sum) are attached to the cleaning
    pipeline's plan with df.observe() and collected as a side effect
    of the job that materializes the result — ZERO extra scans, where
    the reference's quality checks re-query the table after load
    (`app.py:142-147`). The observed values surface as a
    (metric, value) relation; the oracle recomputes them with plain
    SQL aggregates."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("n_nonpositive_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
            .otherwise(0)
        ).alias("n_bad_status"),
        F.sum(F.col("o_totalprice").cast("decimal(30,8)")).alias(
            "sum_price"
        ),
    )
    # the production action: materialize the cleaned projection (here
    # reduced to a count so the bench measures engine time only)
    observed.filter(F.col("o_totalprice") > 0).count()
    got = obs.get
    return spark.createDataFrame(
        [
            ("n_rows", float(got["n_rows"])),
            ("n_nonpositive_price", float(got["n_nonpositive_price"])),
            ("n_bad_status", float(got["n_bad_status"])),
            ("sum_price", float(got["sum_price"])),
        ],
        "metric STRING, value DOUBLE",
    ).select("metric", _fround(F.col("value"), 2).alias("value"))


def q_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard-threshold set-similarity self-join via PREFIX
    FILTERING (the PPJoin family's core idea) — the deterministic
    complement to MinHash-LSH: candidates come only from docs sharing
    a token in their RARITY-ORDERED PREFIX (first n - ceil(t*n) + 1
    tokens, rarest first), which provably loses NO pair with Jaccard
    >= t (two sets overlapping that much must collide inside either
    prefix), then the exact intersection verifies. LSH trades recall
    for speed; this trades nothing and still never goes O(n²): the
    candidate join runs over prefix tokens only WITHIN a (lang,
    source) block — the realistic intra-source near-dup sweep
    (cross-source discovery is dedup_minhash_lsh's job), which also
    caps any one token bucket at its block's population — and rarity
    ordering makes prefix tokens the LOW-frequency ones, so bucket
    sizes stay small where frequency-blind blocking would explode on
    stopwords. Tokens sort by per-doc (global_freq, token) with no
    global rank table materialized; this synthetic corpus is
    template-generated (docs share most vocabulary), the WORST case
    for similarity joins — the measured key demonstrates the pruning
    holds even there."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    return prefix_filter_pairs(docs, t=0.9)


def prefix_filter_pairs(docs: DataFrame, t: float) -> DataFrame:
    """The prefix-filtering pipeline behind q_prefix_filter_join,
    exposed for property testing: docs (doc_id, lang, source, text) ->
    all intra-(lang, source) pairs with token-set Jaccard >= t, found
    via rarity-ordered prefix candidates and exact verification —
    guaranteed complete (no false negatives)."""
    toks = (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("n"))
    per_doc = (
        toks.join(freq, "tok")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("n", "tok"))
            ).alias("arr")
        )
        .withColumn("n_tok", F.size("arr"))
        .withColumn(
            "p",
            F.col("n_tok") - F.ceil(F.lit(t) * F.col("n_tok")) + 1,
        )
        .withColumn(
            "toks",
            F.transform(F.col("arr"), lambda x: x["tok"]),
        )
    )
    prefix = per_doc.select(
        "doc_id",
        "lang",
        "source",
        "n_tok",
        "toks",
        F.explode(F.slice("arr", 1, F.col("p"))).alias("pt"),
    ).select(
        "doc_id",
        "lang",
        "source",
        "n_tok",
        "toks",
        F.col("pt.tok").alias("tok"),
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_tok").alias("na"),
            F.col("b.n_tok").alias("nb"),
            F.col("a.toks").alias("ta"),
            F.col("b.toks").alias("tb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ni = F.size(F.array_intersect("ta", "tb"))
    jac = ni / (F.col("na") + F.col("nb") - ni).cast("double")
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= t)
        .select(
            "doc_a",
            "doc_b",
            _fround(F.col("jaccard"), 4).alias("jaccard"),
        )
    )


def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch TIME-DECAY attribution (completes the attribution
    family next to last-touch): every click/view touch in the 7 days
    before a purchase earns harmonic decay credit 1/(1 + age_days),
    normalized so each purchase distributes exactly 1.0 across its
    touches; per channel the credits sum. The touch-to-purchase range
    join carries only (user, ts, type) and is bounded per user by the
    7-day window — the skew ceiling is one user's weekly event volume,
    not the table. Harmonic (not exponential) decay is deliberate:
    every weight is ONE IEEE division of exact integers, so both
    engines compute bit-identical weights (libm pow is not correctly
    rounded), and every cross-row sum crosses engines as decimal —
    order-independent."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    touches = ev.filter(F.col("event_type").isin("click", "view"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    age_days = F.floor(
        (
            F.unix_timestamp("p_ts") - F.unix_timestamp("ts")
        ).cast("double")
        / F.lit(86400.0)
    ).cast("int")
    joined = touches.join(
        buys,
        (touches["user_id"] == buys["user_id"])
        & (F.col("ts") < F.col("p_ts"))
        & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    ).select(
        "event_type",
        "p_id",
        (F.lit(1.0) / (F.lit(1.0) + age_days)).alias("w"),
    )
    w_tot = Window.partitionBy("p_id")
    credited = joined.withColumn(
        "credit",
        F.col("w")
        / F.sum(F.col("w").cast("decimal(30,15)"))
        .over(w_tot)
        .cast("double"),
    )
    return credited.groupBy("event_type").agg(
        _fround(
            F.sum(F.col("credit").cast("decimal(30,15)")).cast("double"),
            4,
        ).alias("total_credit"),
        F.countDistinct("p_id").cast("bigint").alias("n_purchases"),
    )


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch RE-AGGREGABILITY along a dimension hierarchy: ONE
    per-(type, day) HLL sketch table serves every rollup level — per
    type (days merged), per day (types merged), and grand total — by
    hll_union_agg alone, never returning to the raw facts. This is
    what makes sketch tables the 100 TB answer to count(DISTINCT)
    cubes: a |types|x|days| sketch relation replaces a fact scan per
    grouping set. The exact sides (one GROUPING SETS pass, computed
    only for the driver-checkable bound) mirror DuckDB's; est_ok is
    the hll_sketch_union contract (within max(2, 5%))."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    by_type = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).select(
        F.lit("by_type").alias("level"),
        "event_type",
        F.lit("ALL").alias("day"),
        "est",
    )
    by_day = daily.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).select(
        F.lit("by_day").alias("level"),
        F.lit("ALL").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "est",
    )
    grand = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).select(
        F.lit("grand").alias("level"),
        F.lit("ALL").alias("event_type"),
        F.lit("ALL").alias("day"),
        "est",
    )
    ests = by_type.unionByName(by_day).unionByName(grand)
    # one GROUPING SETS pass for exactly the three needed exact levels
    # (verification only) — a cube would Expand every row 4x and the
    # finest (event_type, day) cells would be filtered straight back
    # out; grouping_id (not NULL-sniffing) names the level robustly
    exact = (
        ev.groupingSets(
            [["event_type"], ["day"], []], "event_type", "day"
        )
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.grouping_id().alias("_gid"),
        )
        .select(
            F.when(F.col("_gid") == 1, F.lit("by_type"))
            .when(F.col("_gid") == 2, F.lit("by_day"))
            .otherwise(F.lit("grand"))
            .alias("level"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(
                F.date_format("day", "yyyy-MM-dd"), F.lit("ALL")
            ).alias("day"),
            "n_exact",
        )
    )
    return ests.join(exact, ["level", "event_type", "day"]).select(
        "level",
        "event_type",
        "day",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.greatest(F.lit(2.0), F.lit(0.05) * F.col("n_exact"))
        ).alias("est_ok"),
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


def fk_report(
    checks: list[tuple[str, str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit over (label_fk, label_pk, child,
    fk_col, parent, pk_col) checks — each child table is scanned ONCE
    for ALL of its checks: its FK columns are left-joined against the
    parents' (broadcastable, distinct) key sets with per-check hit
    indicators, and one aggregation counts rows plus per-check
    missing-indicator orphans; a ``stack`` unpivots the single-row
    result into one report row per check. A NULL fk never matches its
    key set, so it counts as an orphan — identical to the anti-join /
    NOT EXISTS semantics. This is the FK validation a MERGE chain
    needs BEFORE it trusts its keys (the reference's SPs join on them
    blindly); at 100 TB the fact table is the dominant cost and is
    read exactly once per audit (a huge parent's key set would ride a
    Bloom filter first — the bloom_prune_join machinery)."""
    by_child: dict[int, tuple[DataFrame, list]] = {}
    order = []
    for chk in checks:
        k = id(chk[2])
        if k not in by_child:
            by_child[k] = (chk[2], [])
            order.append(k)
        by_child[k][1].append(chk)
    outs = []
    for k in order:
        child, chks = by_child[k]
        fks = list(dict.fromkeys(c[3] for c in chks))
        df = child.select(*fks)
        aggs = [F.count("*").cast("bigint").alias("n_child")]
        for i, (_fk_l, _pk_l, _c, fk, parent, pk) in enumerate(chks):
            ind = f"_hit_{i}"
            keys = (
                parent.select(F.col(pk).alias(fk))
                .distinct()
                .withColumn(ind, F.lit(1))
            )
            df = df.join(F.broadcast(keys), fk, "left")
            aggs.append(
                F.count(F.when(F.col(ind).isNull(), 1))
                .cast("bigint")
                .alias(f"_orph_{i}")
            )
        def _q(s: str) -> str:  # SQL string literal, quote-safe
            return "'" + s.replace("'", "''") + "'"

        stacked = ", ".join(
            f"{_q(fk_l)}, {_q(pk_l)}, _orph_{i}"
            for i, (fk_l, pk_l, *_rest) in enumerate(chks)
        )
        outs.append(
            df.agg(*aggs).select(
                F.expr(
                    f"stack({len(chks)}, {stacked})"
                    " AS (fk, parent, n_orphans)"
                ),
                "n_child",
            ).select(
                "fk",
                "parent",
                "n_child",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("fk_holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 foreign-key audit across the star schema (fk_report):
    every MERGE/join key the work-table chain relies on, validated
    with one anti-join each before anything trusts it."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    ev = load_table(spark, sf_dir, "events")
    return fk_report(
        [
            ("orders.o_custkey", "customer.c_custkey", o, "o_custkey", c, "c_custkey"),
            ("lineitem.l_orderkey", "orders.o_orderkey", li, "l_orderkey", o, "o_orderkey"),
            ("lineitem.l_partkey", "part.p_partkey", li, "l_partkey", p, "p_partkey"),
            ("lineitem.l_suppkey", "supplier.s_suppkey", li, "l_suppkey", s, "s_suppkey"),
            ("events.user_id", "customer.c_custkey", ev, "user_id", c, "c_custkey"),
        ]
    )


def q_streaming_cms_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + §2.6: the count-min sketch MAINTAINED BY A STREAM —
    completes the mergeable-state trilogy (histogram counts,
    HLL sketches, CMS): each micro-batch aggregates its own CMS with
    Spark's count_min_sketch (same eps/confidence/seed, so merges are
    valid) and folds it into the persisted single-row binary state via
    the JVM sketch's mergeInPlace — fixed O(depth x width) state no
    matter the stream length. Replay-idempotent via commit-carried
    batch ids (a CMS fold double-counts on replay). The final
    estimates must satisfy the one-sided CMS contract against exact
    counts — the same oracle as heavy_hitters_cms by construction."""
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.sources.versioned import (
        committed_metas,
        current_version,
        read_snapshot,
        write_snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    base = tempfile.mkdtemp(prefix="graft_scms_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_scms_")
    src = os.path.join(base, "src")
    state_log = os.path.join(base, "state")
    EPS, CONF, SEED = 0.001, 0.99, 42

    def _read_cms(bspark, blob):
        return (
            bspark._jvm.org.apache.spark.util.sketch.CountMinSketch
            .readFrom(bytes(blob))
        )

    def _to_bytes(bspark, cms):
        baos = bspark._jvm.java.io.ByteArrayOutputStream()
        cms.writeTo(baos)
        return bytearray(baos.toByteArray())

    def handle_batch(batch, batch_id: int) -> None:
        if str(batch_id) in committed_metas(state_log):
            return
        bspark = batch.sparkSession
        row = batch.agg(
            F.count_min_sketch(
                F.col("event_type"), F.lit(EPS), F.lit(CONF), F.lit(SEED)
            ).alias("s")
        ).collect()[0]
        if row["s"] is None:  # empty batch: state unchanged
            return
        cms = _read_cms(bspark, row["s"])
        if current_version(state_log) is not None:
            prior = _read_cms(
                bspark,
                read_snapshot(bspark, state_log).collect()[0]["sk"],
            )
            cms = prior.mergeInPlace(cms)
        write_snapshot(
            bspark.createDataFrame(
                [(_to_bytes(bspark, cms),)], "sk BINARY"
            ),
            state_log,
            meta=str(batch_id),
        )

    try:
        cut = "2024-01-16"
        ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(
            os.path.join(src, "w1")
        )
        ev.filter(F.col("ts") >= cut).coalesce(1).write.parquet(
            os.path.join(src, "w2")
        )
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        q = (
            spark.readStream.schema("event_type STRING, ts TIMESTAMP")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

        merged = _read_cms(
            spark, read_snapshot(spark, state_log).collect()[0]["sk"]
        )
        types = [
            r["event_type"]
            for r in ev.select("event_type").distinct().collect()
        ]
        est_df = spark.createDataFrame(
            [(t, int(merged.estimateCount(t))) for t in sorted(types)],
            "event_type STRING, est_count BIGINT",
        )
        true_cnt = ev.groupBy("event_type").agg(
            F.count("*").alias("true_cnt")
        )
        totals = true_cnt.agg(F.sum("true_cnt").alias("n_total"))
        out = (
            true_cnt.join(F.broadcast(est_df), "event_type")
            .crossJoin(F.broadcast(totals))
            .select(
                "event_type",
                F.col("true_cnt").cast("bigint").alias("true_cnt"),
                (
                    (F.col("est_count") >= F.col("true_cnt"))
                    & (
                        F.col("est_count")
                        <= F.col("true_cnt")
                        + F.lit(EPS) * F.col("n_total")
                        + F.lit(1)
                    )
                ).alias("est_ok"),
            )
        )
        return _reclaimed(out, base, ckpt)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def q_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP mergeable quantiles (the SLA-report shape: p50/p90/p99
    latency per event_type) from per-(group, bucket) histogram state —
    the grouped form of incremental_quantiles: one partial aggregation
    buckets every row against its GROUP's geometry (per-group lo/width
    from one bounds pass, broadcast back), the state is
    |groups|x|bins| rows, and every group's quantiles interpolate from
    it with one cumulative window partitioned by group — no global or
    per-group sort of the facts, no per-group job. The oracle carries
    the exact per-group percentiles plus the same provable
    order-statistic bound; tolerances ride per-row since width varies
    by group."""
    import math

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.col("value").cast("double").alias("value"))
        # NULL values would otherwise corrupt the state: count(*) counts
        # them while percentile()/the rank lookup skip them, and the
        # (group, NULL)-bucket row sorts first under the cumulative
        # window, inflating cum_before for every real bucket. Dropping
        # them up front matches DuckDB's quantile_cont NULL semantics.
        .filter(F.col("value").isNotNull())
    )
    n_b = 256
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("_lo"),
        F.max("value").alias("_hi"),
        F.count("*").alias("_n"),
    ).withColumn(
        "_w",
        F.when(
            F.col("_hi") > F.col("_lo"),
            (F.col("_hi") - F.col("_lo")) / F.lit(float(n_b)),
        ).otherwise(F.lit(1.0)),
    )
    bucketed = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.least(
            F.lit(n_b),
            (
                F.floor((F.col("value") - F.col("_lo")) / F.col("_w"))
                + 1
            ).cast("int"),
        ).alias("bucket"),
    )
    state = bucketed.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = state.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "cum_before", F.col("cum") - F.col("n")
    )
    qs = spark.createDataFrame(
        [(0.5,), (0.9,), (0.99,)], "q DOUBLE"
    )
    located = (
        cum.join(F.broadcast(bounds), "event_type")
        .crossJoin(F.broadcast(qs))
        .withColumn(
            "_r", F.col("q") * (F.col("_n") - 1).cast("double") + 1.0
        )
        .filter(
            (F.col("cum_before") < F.col("_r"))
            & (F.col("_r") <= F.col("cum"))
        )
        .select(
            "event_type",
            "q",
            "_n",
            "_w",
            (
                F.col("_lo")
                + (F.col("bucket") - 1) * F.col("_w")
                + (F.col("_r") - F.col("cum_before"))
                / F.col("n")
                * F.col("_w")
            ).alias("est"),
        )
    )
    # exact side (VERIFICATION ONLY — production serves `est` from the
    # state): interpolated per-group percentiles for the report, and
    # the x_floor(r)/x_ceil(r) ORDER STATISTICS for the bound — the
    # provable one (est within one width of both); a bound against the
    # interpolated exact would be false for gapped data (see
    # _histogram_quantile_report). Fractions vary per group (n
    # differs), so the order statistics come from a rank lookup, which
    # sorts facts per group on this verification path only.
    ex = ev.groupBy("event_type").agg(
        F.expr(
            "percentile(value, array(0.5D, 0.9D, 0.99D))"
        ).alias("ex")
    )
    qpos = spark.createDataFrame(
        [(0.5, 1), (0.9, 2), (0.99, 3)], "q DOUBLE, i INT"
    )
    exact = ex.crossJoin(F.broadcast(qpos)).select(
        "event_type", "q", F.element_at("ex", F.col("i")).alias("exact_value")
    )
    w_rank = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.withColumn("rn", F.row_number().over(w_rank))
    targets = (
        bounds.select("event_type", "_n")
        .crossJoin(F.broadcast(qs))
        .withColumn(
            "_r", F.col("q") * (F.col("_n") - 1).cast("double") + 1.0
        )
        .select(
            "event_type",
            "q",
            F.floor("_r").cast("int").alias("rn_lo"),
            F.ceil("_r").cast("int").alias("rn_hi"),
        )
    )
    os_stats = (
        ranked.alias("r")
        .join(
            F.broadcast(targets.alias("t")),
            (F.col("r.event_type") == F.col("t.event_type"))
            & (
                (F.col("r.rn") == F.col("t.rn_lo"))
                | (F.col("r.rn") == F.col("t.rn_hi"))
            ),
        )
        .groupBy(
            F.col("t.event_type").alias("event_type"),
            F.col("t.q").alias("q"),
        )
        .agg(
            F.min(
                F.when(
                    F.col("r.rn") == F.col("t.rn_lo"), F.col("r.value")
                )
            ).alias("x_lo"),
            F.max(
                F.when(
                    F.col("r.rn") == F.col("t.rn_hi"), F.col("r.value")
                )
            ).alias("x_hi"),
        )
    )
    joined = located.join(exact, ["event_type", "q"]).join(
        os_stats, ["event_type", "q"]
    )
    tol = F.col("_w") + F.lit(1e-6)
    return joined.select(
        "event_type",
        "q",
        _fround(F.col("exact_value"), 4).alias("exact_value"),
        (
            (F.col("est") >= F.col("x_lo") - tol)
            & (F.col("est") <= F.col("x_hi") + tol)
        ).alias("est_ok"),
    )


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 market-basket association rules (support / confidence /
    lift) over order baskets — the Apriori shape that scales: items
    below pair support are pruned FIRST (an infrequent item can appear
    in no frequent pair), baskets are collected as sorted arrays, and
    candidate pairs are generated WITHIN each row by a higher-order
    transform (map-side, zero join) before one pair-count aggregation.
    The naive basket self-join shuffles |items-per-order|^2 rows per
    order; this plan shuffles each basket once. Confidence and lift
    are exact integer ratios — engine-identical doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    min_sup = 3
    items = li.select("l_orderkey", "l_partkey").distinct()
    item_n = items.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_item")
    )
    freq = item_n.filter(F.col("n_item") >= min_sup)
    baskets = (
        items.join(F.broadcast(freq.select("l_partkey")), "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("its"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(its, (x, i) ->"
                " transform(slice(its, i + 2, size(its)),"
                " y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("pr")
    ).select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
    pair_n = (
        pairs.groupBy("p1", "p2")
        .agg(F.count("*").cast("bigint").alias("n_pair"))
        .filter(F.col("n_pair") >= min_sup)
    )
    # basket universe for support: |distinct transactions| — an order
    # whose items were ALL pruned still counts, so this must come from
    # the pre-prune relation (the orders table is NOT 1:1 with it:
    # childless orders exist). One extra orderkey-keyed partial-count
    # aggregate of the deduped pairs; its result is a single row.
    n_baskets = items.select("l_orderkey").distinct().agg(
        F.count("*").cast("double").alias("_nb")
    )
    # both rule directions from each unordered frequent pair
    rules = pair_n.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("p1").alias("ante"),
                    F.col("p2").alias("cons"),
                    F.col("n_pair"),
                ),
                F.struct(
                    F.col("p2").alias("ante"),
                    F.col("p1").alias("cons"),
                    F.col("n_pair"),
                ),
            )
        ).alias("r")
    ).select("r.ante", "r.cons", "r.n_pair")
    out = (
        rules.join(
            F.broadcast(
                item_n.select(
                    F.col("l_partkey").alias("ante"),
                    F.col("n_item").alias("n_ante"),
                )
            ),
            "ante",
        )
        .join(
            F.broadcast(
                item_n.select(
                    F.col("l_partkey").alias("cons"),
                    F.col("n_item").alias("n_cons"),
                )
            ),
            "cons",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        F.col("ante").alias("antecedent"),
        F.col("cons").alias("consequent"),
        "n_pair",
        "n_ante",
        _fround(
            F.col("n_pair").cast("double") / F.col("n_ante"), 6
        ).alias("confidence"),
        _fround(
            F.col("n_pair").cast("double")
            * F.col("_nb")
            / (F.col("n_ante") * F.col("n_cons")),
            6,
        ).alias("lift"),
    )


def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 categorical target encoding for feature pipelines:
    per-category smoothed mean encoding plus the LEAVE-ONE-OUT family
    rendered in closed form from one moment pass — per row i the LOO
    encoding is (S - y_i)/(n - 1), so the per-category min / max /
    mean-square of ALL row-level encodings follow from (n, S, Q=sum y²,
    min y, max y) with no per-row second pass and no self-join. This is
    the leakage-safe encoder a 100 TB training pipeline needs: the fact
    table is scanned once, the encoder table is |categories|-sized.
    Decimal moment sums keep every number engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    d = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").alias("y"),
    )

    def dsum(e):
        return F.sum(e.cast("decimal(38,12)")).cast("double")

    g = d.groupBy("segment").agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.col("y")).alias("s"),
        dsum(F.col("y") * F.col("y")).alias("q"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
    prior = d.agg(
        (dsum(F.col("y")) / F.count("*")).alias("_prior")
    )
    m = F.lit(20.0)
    loo_den = (F.col("n") - 1) * (F.col("n") - 1)
    return g.crossJoin(F.broadcast(prior)).select(
        "segment",
        F.col("n").cast("bigint").alias("n"),
        _fround(
            (F.col("s") + m * F.col("_prior")) / (F.col("n") + m), 4
        ).alias("enc_smoothed"),
        _fround(
            (F.col("s") - F.col("y_max")) / (F.col("n") - 1), 4
        ).alias("loo_min"),
        _fround(
            (F.col("s") - F.col("y_min")) / (F.col("n") - 1), 4
        ).alias("loo_max"),
        _fround(
            ((F.col("n") - 2) * F.col("s") * F.col("s") + F.col("q"))
            / (loo_den * F.col("n")),
            4,
        ).alias("loo_sq_mean"),
    )


def q_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 weight-of-evidence / information-value feature screening:
    equi-depth bin a numeric feature (ntile over a TOTAL order —
    deterministic in any engine), cross each bin with a binary target
    (customer ever placed an URGENT order), and score WOE =
    ln(odds_bin / odds_global) with +0.5 Laplace cells so empty bins
    stay finite. The credit-scoring screen, but distributed: one
    |customers|-sized window for the binning, one |bins|-row report.
    At 100 TB the ntile window would ride the two-phase bucketed rank
    (grouped_quantiles machinery); at dimension-table scale the plain
    window is the right plan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    lab = (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                (F.col("o_orderpriority") == "1-URGENT").cast("int")
            ).alias("pos")
        )
    )
    t = c.join(
        lab, c["c_custkey"] == lab["o_custkey"], "left"
    ).select(
        "c_custkey",
        "c_acctbal",
        F.coalesce(F.col("pos"), F.lit(0)).alias("pos"),
    )
    n_bins = 10
    binned = t.withColumn(
        "bin",
        F.ntile(n_bins).over(
            Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
        ),
    )
    g = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n_neg"),
        _fround(F.min("c_acctbal"), 2).alias("bin_lo"),
        _fround(F.max("c_acctbal"), 2).alias("bin_hi"),
    )
    tot = t.agg(
        F.sum("pos").cast("double").alias("_pt"),
        F.sum(1 - F.col("pos")).cast("double").alias("_nt"),
    )
    pr = (F.col("n_pos") + 0.5) / F.col("_pt")
    nr = (F.col("n_neg") + 0.5) / F.col("_nt")
    woe = F.log(pr / nr)
    return g.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_pos",
        "n_neg",
        "bin_lo",
        "bin_hi",
        _fround(woe, 6).alias("woe"),
        _fround(
            (
                F.col("n_pos") / F.col("_pt")
                - F.col("n_neg") / F.col("_nt")
            )
            * woe,
            6,
        ).alias("iv_contrib"),
    )


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1+§2.10 small-file compaction planner — the lakehouse
    maintenance pass the day-partitioned JSON sink (S3) eventually
    needs: given a per-partition file manifest (path, bytes), assign
    files to target-sized output bins with ONE window pass per
    partition — bin = floor(running-bytes-before / target) over a
    deterministic (bytes DESC, file) order — instead of a sequential
    first-fit loop that cannot distribute. Bins overshoot the target by
    at most one file, every partition plans independently in parallel,
    and the plan is |files|-sized metadata, never data. The manifest
    here is derived deterministically from the events table (day x
    user-shard pseudo-files) so the oracle can replay it."""
    ev = load_table(spark, sf_dir, "events")
    target = 4096
    manifest = (
        ev.groupBy(
            F.to_date("ts").alias("day"),
            F.pmod(F.col("user_id"), F.lit(20)).alias("file_id"),
        )
        .agg(
            (
                F.lit(128)
                + F.sum(F.length("event_type") + F.lit(24))
            )
            .cast("bigint")
            .alias("bytes")
        )
    )
    w = Window.partitionBy("day").orderBy(
        F.col("bytes").desc(), F.col("file_id")
    )
    planned = manifest.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("bytes").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn(
        "bin", F.floor(F.col("cum_before") / F.lit(target)).cast("int")
    )
    return (
        planned.groupBy(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "bin"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("bytes_total"),
        )
        .withColumn("is_merge", F.col("n_files") > 1)
    )


_CV_MOMS = ("n", "sx", "sy", "sxx", "sxy", "syy")


def _cv_fold_moments(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Shared (segment, fold) moment relation for the k-fold CV family
    (kfold_cv_ols, ridge_path_cv) — ONE decimal moment pass over the
    orders⨝customer fact, segment totals, train = total - fold.
    Columns: segment, fold, n_tot, tr_<m> (train moments, double) and
    f_<m> (held-out fold moments, double) for m in n/sx/sy/sxx/sxy/syy.
    Both consumers derive their closed-form models from THIS relation
    so the fold hashing / decimal scale / moment algebra can't drift
    between them."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    d = o.join(
        F.broadcast(
            c.select("c_custkey", "c_mktsegment", "c_acctbal")
        ),
        o["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderkey") % k).cast("int").alias("fold"),
        F.col("c_acctbal").alias("x"),
        F.col("o_totalprice").alias("y"),
    )

    def dsum(e):
        return F.sum(e.cast("decimal(38,12)"))

    fm = d.groupBy("segment", "fold").agg(
        F.count("*").cast("decimal(38,12)").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    tot = fm.groupBy("segment").agg(
        *[F.sum(col).alias("t_" + col) for col in _CV_MOMS]
    )
    return fm.join(tot, "segment").select(
        "segment",
        "fold",
        F.col("t_n").cast("double").alias("n_tot"),
        *[
            (F.col("t_" + col) - F.col(col))
            .cast("double")
            .alias("tr_" + col)
            for col in _CV_MOMS
        ],
        *[
            F.col(col).cast("double").alias("f_" + col)
            for col in _CV_MOMS
        ],
    )


def _oof_sse(icept, slope):
    """Held-out SSE unfolded from the fold's own moments (f_*):
    Qy - 2a·Sy - 2b·Sxy + 2ab·Sx + a²n + b²Sxx."""
    return (
        F.col("f_syy")
        - 2 * icept * F.col("f_sy")
        - 2 * slope * F.col("f_sxy")
        + 2 * icept * slope * F.col("f_sx")
        + icept * icept * F.col("f_n")
        + slope * slope * F.col("f_sxx")
    )


def q_kfold_cv_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 k-fold cross-validated many-models OLS — the evaluation
    loop that normally forces k re-trainings collapses into ONE moment
    pass (_cv_fold_moments): per-(segment, fold) moment vectors sum
    EXACTLY (decimal) to the segment totals, each fold's train model is
    the closed-form fit on (total - fold) moments, and the held-out SSE
    unfolds algebraically from the fold's own moments (_oof_sse).
    k models x |segments| segments evaluated with zero extra scans —
    extends per_group_ols (queries.py:1134) from fit to honest
    out-of-fold error."""
    j = _cv_fold_moments(spark, sf_dir, k=5)
    slope = (
        F.col("tr_n") * F.col("tr_sxy")
        - F.col("tr_sx") * F.col("tr_sy")
    ) / (
        F.col("tr_n") * F.col("tr_sxx")
        - F.col("tr_sx") * F.col("tr_sx")
    )
    icept = (F.col("tr_sy") - slope * F.col("tr_sx")) / F.col("tr_n")
    per_fold = j.select(
        "segment",
        "n_tot",
        slope.alias("_slope"),
        _oof_sse(icept, slope).alias("_sse"),
    )
    return per_fold.groupBy("segment").agg(
        F.max("n_tot").cast("bigint").alias("n"),
        _fround(
            F.sqrt(
                F.sum(F.expr("CAST(_sse AS DECIMAL(38,6))")).cast(
                    "double"
                )
                / F.max("n_tot")
            ),
            4,
        ).alias("cv_rmse"),
        _fround(F.min("_slope"), 6).alias("slope_lo"),
        _fround(F.max("_slope"), 6).alias("slope_hi"),
    )


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 corpus-statistics screening: per-language Zipf-law fit —
    OLS of ln(frequency) on ln(rank) over the top-100 token ranks plus
    the full type count. Complements vocab_growth (Heaps) and
    vocab_gini: the slope (~-1 for natural text) is the standard
    generated-vs-natural screen for LLM corpus intake. One token
    explode, one count aggregation, one |types|-per-lang window for
    ranks, decimal-cast ln sums so the 100-term OLS is
    order-independent and engine-identical."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    )
    counts = toks.groupBy("lang", "tok").agg(
        F.count("*").cast("bigint").alias("n")
    )
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.col("n").desc(), F.col("tok")
            )
        ),
    )
    top = 100
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("n").cast("double"))

    def dsum(e):
        return F.sum(
            F.when(F.col("rank") <= top, e).cast("decimal(38,18)")
        ).cast("double")

    g = ranked.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_types"),
        F.sum((F.col("rank") <= top).cast("int"))
        .cast("double")
        .alias("m"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * x).alias("sxx"),
        dsum(x * y).alias("sxy"),
        dsum(y * y).alias("syy"),
    )
    cov = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    return g.select(
        "lang",
        "n_types",
        _fround(cov / varx, 4).alias("zipf_slope"),
        _fround(cov * cov / (varx * vary), 4).alias("r2"),
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


def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 POSITION-BASED (U-shaped) multi-touch attribution —
    completes the family next to last-touch and time-decay: within each
    purchase's 7-day touch window the first and last touches earn 0.4
    each and the middles share 0.2 (1 touch -> 1.0, 2 -> 0.5/0.5).
    Position comes from ONE window over the per-purchase touch sets the
    range join already produced; every weight is exact binary literals
    and one IEEE division, credits cross engines as decimal sums."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    touches = ev.filter(F.col("event_type").isin("click", "view"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    joined = touches.join(
        buys,
        (touches["user_id"] == buys["user_id"])
        & (F.col("ts") < F.col("p_ts"))
        & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    ).select("event_type", "p_id", "ts", "event_id")
    w = Window.partitionBy("p_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("p_id")
    pos = (
        joined.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count("*").over(w_all))
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("rk") == 1, F.lit(0.4))
        .when(F.col("rk") == F.col("n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return pos.groupBy("event_type").agg(
        _fround(
            F.sum(credit.cast("decimal(30,15)")).cast("double"), 4
        ).alias("total_credit"),
        F.countDistinct("p_id").cast("bigint").alias("n_purchases"),
    )


def q_ridge_path_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 hyperparameter tuning at scale: the ridge regularization
    path per segment, cross-validated, from the SAME single moment
    pass as kfold_cv_ols (_cv_fold_moments — shared, so the fold
    hashing and decimal algebra cannot drift) — the penalty grid is
    RELATIVE (lambda = alpha * centered train Sxx, alpha in
    {0, .25, 1, 4}, all exact binary), so the sweep is scale-free and
    each (segment, fold, alpha) model is closed-form column algebra on
    the |segments|x|k| moment relation exploded by 4. k x |grid| x
    |segments| honest out-of-fold errors, zero extra scans,
    deterministic best-alpha pick."""
    j = _cv_fold_moments(spark, sf_dir, k=5).select(
        "*",
        F.explode(
            F.array(
                F.lit(0.0), F.lit(0.25), F.lit(1.0), F.lit(4.0)
            )
        ).alias("alpha"),
    )
    sxx_c = F.col("tr_sxx") - F.col("tr_sx") * F.col("tr_sx") / F.col(
        "tr_n"
    )
    sxy_c = F.col("tr_sxy") - F.col("tr_sx") * F.col("tr_sy") / F.col(
        "tr_n"
    )
    slope = sxy_c / (sxx_c * (F.lit(1.0) + F.col("alpha")))
    icept = (F.col("tr_sy") - slope * F.col("tr_sx")) / F.col("tr_n")
    per_alpha = (
        j.select(
            "segment",
            "alpha",
            F.col("n_tot"),
            _oof_sse(icept, slope).alias("_sse"),
        )
        .groupBy("segment", "alpha")
        .agg(
            _fround(
                F.sqrt(
                    F.sum(F.expr("CAST(_sse AS DECIMAL(38,6))")).cast(
                        "double"
                    )
                    / F.max("n_tot")
                ),
                4,
            ).alias("cv_rmse")
        )
    )
    w_best = Window.partitionBy("segment").orderBy(
        F.col("cv_rmse").asc(), F.col("alpha").asc()
    )
    return per_alpha.select(
        "segment",
        "alpha",
        "cv_rmse",
        (F.row_number().over(w_best) == 1).alias("is_best"),
    )


def q_purged_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 leakage-safe TEMPORAL cross-validation folds with an
    embargo gap (the forecasting twin of cluster_safe_split): three
    rolling-origin test weeks, train strictly before test-start minus a
    2-day embargo so label-adjacent rows can't leak across the
    boundary. One conditional-aggregation pass over the facts (the
    fk_report single-scan shape) renders all folds; gap_ok re-verifies
    the embargo from the data itself, not the spec."""
    ev = load_table(spark, sf_dir, "events").select("ts")
    folds = [
        ("f1", "2024-01-08", "2024-01-15"),
        ("f2", "2024-01-15", "2024-01-22"),
        ("f3", "2024-01-22", "2024-01-29"),
    ]
    embargo = F.expr("INTERVAL 2 DAYS")
    aggs = []
    for name, start, end in folds:
        s, e = F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp")
        in_tr = F.col("ts") < s - embargo
        in_te = (F.col("ts") >= s) & (F.col("ts") < e)
        aggs += [
            F.count(F.when(in_tr, 1)).cast("bigint").alias(f"_ntr_{name}"),
            F.count(F.when(in_te, 1)).cast("bigint").alias(f"_nte_{name}"),
            F.max(F.when(in_tr, F.col("ts"))).alias(f"_mtr_{name}"),
            F.min(F.when(in_te, F.col("ts"))).alias(f"_mte_{name}"),
        ]
    one = ev.agg(*aggs)
    stacked = ", ".join(
        f"'{name}', _ntr_{name}, _nte_{name}, _mtr_{name}, _mte_{name}"
        for name, _s, _e in folds
    )
    out = one.select(
        F.expr(
            f"stack({len(folds)}, {stacked})"
            " AS (fold, n_train, n_test, max_train_ts, min_test_ts)"
        )
    )
    gap = F.unix_timestamp("min_test_ts") - F.unix_timestamp(
        "max_train_ts"
    )
    return out.select(
        "fold",
        "n_train",
        "n_test",
        _ts_str("max_train_ts").alias("max_train_ts"),
        _ts_str("min_test_ts").alias("min_test_ts"),
        (gap >= F.lit(172800)).alias("gap_ok"),
    )


def _changepoint_daily(ev: DataFrame) -> DataFrame:
    """Per-(event_type, day) decimal moment partials (n, S, Q) — the
    MERGEABLE state of the change-point detector: partials from any
    batch split sum key-wise (decimal, exact) to the full state, the
    same algebra the profile / histogram / quantile states use."""

    def dsum(e):
        return F.sum(e.cast("decimal(38,12)"))

    return ev.groupBy("event_type", "day").agg(
        F.count("*").cast("decimal(38,12)").alias("n"),
        dsum(F.col("value")).alias("s"),
        dsum(F.col("value") * F.col("value")).alias("q"),
    )


def _merge_changepoint_states(parts: DataFrame) -> DataFrame:
    """Fold stacked daily partials into one state row per (type, day):
    decimal sums are exact, so merged == recomputed-from-scratch."""
    return parts.groupBy("event_type", "day").agg(
        F.sum("n").cast("decimal(38,12)").alias("n"),
        F.sum("s").cast("decimal(38,12)").alias("s"),
        F.sum("q").cast("decimal(38,12)").alias("q"),
    )


def q_changepoint_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 change-point detection per series (binary-segmentation
    step 1, the time-axis sibling of decision_stump): the SSE-optimal
    day split of each event_type's value series found from ONE daily
    moment aggregation — cumulative decimal (n, S, Q) prefixes per
    type give every candidate split's left/right SSE in closed form,
    argmin by window rank with earliest-day tiebreak. |types|x|days|
    state; the fact table is scanned once; no per-candidate job."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.col("value").cast("double").alias("value"),
        )
        .filter(F.col("value").isNotNull())
    )
    return _changepoint_render(_changepoint_daily(ev))


def _changepoint_render(daily: DataFrame) -> DataFrame:
    """Score every candidate split from cumulative prefixes of the
    (type, day) moment state and pick the per-type SSE argmin —
    shared verbatim by the batch key and the streaming maintenance
    twin so the two renders can never drift."""
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("n").over(w_cum).cast("double").alias("cn"),
        F.sum("s").over(w_cum).cast("double").alias("cs"),
        F.sum("q").over(w_cum).cast("double").alias("cq"),
        F.sum("n").over(w_tot).cast("double").alias("tn"),
        F.sum("s").over(w_tot).cast("double").alias("ts_"),
        F.sum("q").over(w_tot).cast("double").alias("tq"),
    ).filter(F.col("cn") < F.col("tn"))
    sse_l = F.col("cq") - F.col("cs") * F.col("cs") / F.col("cn")
    sse_r = (F.col("tq") - F.col("cq")) - (
        F.col("ts_") - F.col("cs")
    ) * (F.col("ts_") - F.col("cs")) / (F.col("tn") - F.col("cn"))
    baseline = F.col("tq") - F.col("ts_") * F.col("ts_") / F.col("tn")
    scored = cum.select(
        "event_type",
        "day",
        "cn",
        "cs",
        "tn",
        "ts_",
        (sse_l + sse_r).alias("_sse"),
        baseline.alias("_base"),
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.col("_sse").asc(), F.col("day").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            F.col("cn").cast("bigint").alias("n_before"),
            (F.col("tn") - F.col("cn")).cast("bigint").alias("n_after"),
            _fround(F.col("cs") / F.col("cn"), 4).alias("mean_before"),
            _fround(
                (F.col("ts_") - F.col("cs"))
                / (F.col("tn") - F.col("cn")),
                4,
            ).alias("mean_after"),
            _fround(F.col("_base") - F.col("_sse"), 4).alias(
                "sse_reduction"
            ),
        )
    )


def q_streaming_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + §2.10: change-point detection MAINTAINED BY A STREAM —
    events arrive in two date-ordered waves; foreachBatch aggregates
    ONLY its own wave to daily (n, S, Q) partials and folds them
    key-wise into the persisted |types|x|days| state (decimal sums —
    exact, so merged == recomputed). The final render is the SAME
    helper the batch key uses (_changepoint_render), so capacity
    monitoring never rescans history and the oracle is
    changepoint_detect's SQL by construction. State lives in a
    versioned snapshot table whose meta carries the batch id, so a
    replayed micro-batch (crash between state write and checkpoint
    commit) is a no-op instead of double-counting the moments."""
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.sources.versioned import (
        committed_metas,
        current_version,
        read_snapshot,
        write_snapshot,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "ts",
            "event_type",
            F.col("value").cast("double").alias("value"),
        )
        .filter(F.col("value").isNotNull())
    )
    base = tempfile.mkdtemp(prefix="graft_scp_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_scp_")
    src = os.path.join(base, "src")
    state_log = os.path.join(base, "state")

    def handle_batch(batch, batch_id: int) -> None:
        if str(batch_id) in committed_metas(state_log):
            return
        bspark = batch.sparkSession
        part = _changepoint_daily(
            batch.select(
                "event_type", F.to_date("ts").alias("day"), "value"
            )
        )
        if current_version(state_log) is not None:
            prior = read_snapshot(bspark, state_log)
            part = _merge_changepoint_states(prior.unionByName(part))
        write_snapshot(part, state_log, meta=str(batch_id))

    try:
        ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(
            os.path.join(src, "w1")
        )
        ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(
            os.path.join(src, "w2")
        )
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        schema = (
            "event_id BIGINT, ts TIMESTAMP, event_type STRING, "
            "value DOUBLE"
        )
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        out = _changepoint_render(read_snapshot(spark, state_log))
        return _reclaimed(out, base, ckpt)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def q_adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 graph link prediction (completes the graph family next to
    pagerank / triangles / components): Adamic-Adar scores for
    supplier pairs over the bipartite part—supplier graph — common
    neighbors weighted 1/ln(deg(part)), so rare shared parts count
    more. Wedges are generated per part from its sorted supplier array
    (operators/graph.py::adamic_adar_scores — the triangle iterator's
    map-side pattern, no pair self-join); only parts with >=2
    suppliers contribute, so ln(deg) >= ln 2 and the weight is finite.
    Wedge volume is sum(deg²): the WIRED max_degree=256 frequent-prune
    drops hyper-degree parts entirely (inactive at tested SFs — max
    part degree is 52 at sf0.1 — but it bounds one hot part's
    quadratic wedge blowup on a skewed 100× graph; the oracle mirrors
    the cap, and graph_degree_cap_report quantifies the cap ladder).
    Output is the top-50 pairs — the rank window runs over the
    |supplier-pairs| aggregate, never the wedges."""
    from aproximacion_1_etl_spark.operators.graph import adamic_adar_scores

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey")
    scored = adamic_adar_scores(
        edges, "l_partkey", "l_suppkey", max_degree=256
    ).select(
        "s1",
        "s2",
        F.col("common_nbrs").alias("common_parts"),
        F.col("aa_score").alias("_aa"),
    )
    # distributed top-k (TakeOrderedAndProject) instead of a global
    # rank window — the |supplier-pairs| aggregate never single-task
    # sorts; row_number assigns rank on the 50-row survivor set only
    top = scored.orderBy(
        F.col("_aa").desc(), F.col("s1").asc(), F.col("s2").asc()
    ).limit(50)
    w_rank = Window.orderBy(
        F.col("_aa").desc(), F.col("s1").asc(), F.col("s2").asc()
    )
    return (
        top.withColumn("rn", F.row_number().over(w_rank))
        .select(
            "s1",
            "s2",
            "common_parts",
            _fround(F.col("_aa"), 4).alias("aa_score"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


def q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 time-series autocorrelation per series: ACF of the daily
    mean value at lags 1, 2, 7 per event_type — the
    seasonality/persistence screen beside holt_forecast and
    seasonal_anomaly. The fact table collapses to the |types|x|days|
    daily-mean state ONCE; each lag is a self-join of that tiny state
    on (type, day+lag) plus one Pearson moment aggregation — lag count
    scales the state joins, never the fact scan. Decimal cross-row
    sums keep every correlation engine-identical."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.col("value").cast("double").alias("value"),
        )
        .filter(F.col("value").isNotNull())
    )

    def dsum(e):
        return F.sum(e.cast("decimal(38,12)")).cast("double")

    daily = ev.groupBy("event_type", "day").agg(
        (dsum(F.col("value")) / F.count("*")).alias("m")
    )
    lags = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(7))).alias("lag")
    )
    a = daily.alias("a").crossJoin(F.broadcast(lags))
    pairs = a.join(
        daily.alias("b"),
        (F.col("a.event_type") == F.col("b.event_type"))
        & (
            F.col("b.day")
            == F.expr("date_add(a.day, CAST(lag AS INT))")
        ),
    ).select(
        F.col("a.event_type").alias("event_type"),
        "lag",
        F.col("a.m").alias("x"),
        F.col("b.m").alias("y"),
    )
    g = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return g.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        _fround(cov / F.sqrt(vx * vy), 4).alias("acf"),
    )


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 concentration analysis (the Lorenz/80-20 report): per
    market segment, how concentrated is revenue across customers —
    top-decile revenue share and the minimum number of customers
    covering 80% of segment revenue. One fact aggregation to customer
    grain, one per-segment rank window over the |customers| aggregate
    (two-phase bucketed rank at fact scale — grouped_quantiles
    machinery), cumulative decimal sums; the 80% cut compares
    5*cum >= 4*total in EXACT decimal so the boundary can't flap
    between engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)")).alias(
                "r"
            )
        )
    )
    w_rank = Window.partitionBy("c_mktsegment").orderBy(
        F.col("r").desc(), F.col("c_custkey").asc()
    )
    w_seg = Window.partitionBy("c_mktsegment")
    ranked = rev.select(
        "c_mktsegment",
        "r",
        F.row_number().over(w_rank).alias("rk"),
        F.count("*").over(w_seg).alias("n_cust"),
        F.sum("r").over(w_seg).alias("tot"),
        F.sum("r")
        .over(
            w_rank.rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum"),
    )
    return ranked.groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(
        F.max("n_cust").cast("bigint").alias("n_customers"),
        _fround(F.max("tot").cast("double"), 2).alias("total_revenue"),
        _fround(
            F.sum(
                F.when(
                    F.col("rk") <= F.ceil(F.col("n_cust") / 10),
                    F.col("r"),
                )
            ).cast("double")
            / F.max("tot").cast("double"),
            4,
        ).alias("top_decile_share"),
        F.min(
            F.when(
                F.col("cum") * 5 >= F.col("tot") * 4, F.col("rk")
            )
        )
        .cast("bigint")
        .alias("n_for_80pct"),
    )


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 POSITIONAL phrase search (the exact-phrase complement to
    the bag-of-words inverted index / BM25): a positional posting list
    (token, doc, pos) answers exact-phrase queries by a postings
    SELF-JOIN on (doc, pos+1) — the classic IR phrase plan, no
    re-scan of raw text per query. The query set here is the corpus's
    own top-5 bigrams (deterministic (count DESC, a, b) pick), so the
    whole pipeline — index build, query selection, phrase match — is
    one declarative plan. Join keys carry (token, doc, pos) only; at
    100 TB the postings relation is the bucketed asset every phrase
    query reuses."""
    docs = load_table(spark, sf_dir, "documents")
    post = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("pos", "tok"),
    )
    big = (
        post.alias("a")
        .join(
            post.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .select(
            F.col("a.tok").alias("tok_a"),
            F.col("b.tok").alias("tok_b"),
            F.col("a.doc_id").alias("doc_id"),
        )
    )
    counts = big.groupBy("tok_a", "tok_b").agg(
        F.count("*").cast("bigint").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    # distributed top-k before the rank window: the |bigrams|
    # aggregate is TakeOrdered'd to 5 rows, never single-task sorted
    top5 = counts.orderBy(
        F.col("n_occurrences").desc(),
        F.col("tok_a").asc(),
        F.col("tok_b").asc(),
    ).limit(5)
    w_top = Window.orderBy(
        F.col("n_occurrences").desc(),
        F.col("tok_a").asc(),
        F.col("tok_b").asc(),
    )
    return (
        top5.withColumn("rank", F.row_number().over(w_top))
        .select(
            F.concat_ws(" ", "tok_a", "tok_b").alias("phrase"),
            "n_docs",
            "n_occurrences",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def q_reconciliation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 cross-table RECONCILIATION (double-entry DQ): the order
    header's o_totalprice re-derived from its lines
    (sum extprice*(1-disc)*(1+tax)) and the disagreement distribution
    reported per status — the financial-close control a MERGE chain
    needs beyond per-scan expectations (dq_checks validates columns;
    this validates BOOKS). One join at order grain, per-term decimal
    casts so the recomputed totals are order-independent; headers
    with no lines are counted, not silently dropped."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    line_tot = li.groupBy("l_orderkey").agg(
        F.sum(
            (
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * (F.lit(1.0) + F.col("l_tax"))
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("computed")
    )
    j = o.join(
        line_tot, o["o_orderkey"] == F.col("l_orderkey"), "left"
    ).select(
        "o_orderstatus",
        "o_totalprice",
        "computed",
        F.abs(F.col("o_totalprice") - F.col("computed")).alias("ad"),
    )
    return j.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.count("computed").cast("bigint").alias("n_with_lines"),
        F.sum((F.col("ad") <= 0.01).cast("int"))
        .cast("bigint")
        .alias("n_reconciled"),
        _fround(
            F.sum(F.col("ad").cast("decimal(38,12)")).cast("double")
            / F.count("computed"),
            2,
        ).alias("mean_abs_diff"),
        _fround(F.max("ad"), 2).alias("max_abs_diff"),
    )


def q_scd2_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 SCD2 VALIDITY-INTERVAL audit — the invariant check every
    type-2 dimension consumer relies on: per key, intervals must tile
    time (no overlap, no gap: valid_to == next valid_from), exactly
    one open-ended current row, current last. Runs over the engine's
    own scd2_history output via ONE lead window per key (the same
    partitioning the build used, so Catalyst plans one exchange for
    build + audit); reports per-key violation counts aggregated to a
    single audit row. On the engine's builder this must be all-zeros
    by construction — the audit exists for FOREIGN scd2 tables
    (hand-maintained MERGE dimensions, the reference's SP outputs)."""
    from aproximacion_1_etl_spark.operators.refine import scd2_history

    ev = load_table(spark, sf_dir, "events")
    h = scd2_history(
        ev,
        keys=["user_id"],
        ts_col="ts",
        tiebreak="event_id",
        attrs=["event_type"],
    )
    return scd2_audit(h, key="user_id")


def scd2_audit(history: DataFrame, key: str) -> DataFrame:
    """Audit any SCD2 history table (columns: <key>, valid_from,
    valid_to, is_current) for interval-tiling violations — the
    reusable core of q_scd2_audit, callable on foreign hand-maintained
    dimensions."""
    w = Window.partitionBy(key).orderBy(F.col("valid_from").asc())
    marked = history.select(
        key,
        "valid_from",
        "valid_to",
        F.col("is_current").cast("int").alias("cur"),
        F.lead("valid_from").over(w).alias("next_from"),
    )
    per_key = marked.groupBy(key).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("cur").alias("n_current"),
        F.sum(
            (
                F.col("next_from").isNotNull()
                & (F.col("valid_to") > F.col("next_from"))
            ).cast("int")
        ).alias("n_overlap"),
        F.sum(
            (
                F.col("next_from").isNotNull()
                & (F.col("valid_to") < F.col("next_from"))
            ).cast("int")
        ).alias("n_gap"),
        F.sum(
            (
                F.col("valid_to").isNull()
                & F.col("next_from").isNotNull()
            ).cast("int")
        ).alias("n_open_not_last"),
    )
    return per_key.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum((F.col("n_current") != 1).cast("int"))
        .cast("bigint")
        .alias("n_keys_bad_current"),
        F.sum("n_overlap").cast("bigint").alias("n_overlaps"),
        F.sum("n_gap").cast("bigint").alias("n_gaps"),
        F.sum("n_open_not_last").cast("bigint").alias("n_open_not_last"),
        (
            (F.sum((F.col("n_current") != 1).cast("int")) == 0)
            & (F.sum("n_overlap") == 0)
            & (F.sum("n_gap") == 0)
            & (F.sum("n_open_not_last") == 0)
        ).alias("audit_ok"),
    )


def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 hierarchy ratio-to-parent OLAP report: revenue per
    (region, nation) with each nation's share of its region and of
    the grand total — the drill-down idiom every BI layer issues. One
    fact aggregation to the leaf grain, then two windows over the
    |nations| aggregate (parent and grand partitions) — ratios never
    touch the fact table again. Decimal revenue sums; shares are one
    IEEE division each."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(
            "s_suppkey",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )
    leaf = (
        li.join(F.broadcast(dim), li["l_suppkey"] == dim["s_suppkey"])
        .groupBy("region", "nation")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                ).cast("decimal(38,12)")
            ).alias("rev")
        )
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return leaf.select(
        "region",
        "nation",
        _fround(F.col("rev").cast("double"), 2).alias("revenue"),
        _fround(
            F.col("rev").cast("double")
            / F.sum("rev").over(w_region).cast("double"),
            6,
        ).alias("share_of_region"),
        _fround(
            F.col("rev").cast("double")
            / F.sum("rev").over(w_all).cast("double"),
            6,
        ).alias("share_of_total"),
    )


def q_drill_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 DRILL-ACROSS (Kimball): two fact tables at different
    grains — order revenue and event activity — aggregated SEPARATELY
    to the conformed customer-segment dimension, then merged by a full
    outer join on the conformed key. Never a fact-to-fact join: each
    fact shuffles once to the dimension grain (|segments| rows), the
    merge is segment-sized. The cross-process ratio (revenue per
    event) is derivable only at the conformed grain."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    seg = F.broadcast(
        c.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    )
    f_orders = (
        o.join(seg, o["o_custkey"] == F.col("c_custkey"))
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("order_revenue"),
        )
    )
    f_events = (
        ev.join(seg, ev["user_id"] == F.col("c_custkey"))
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            _dsum(F.coalesce(F.col("value"), F.lit(0.0))).alias(
                "event_value"
            ),
        )
    )
    j = f_orders.join(f_events, "segment", "full_outer")
    # coalesce BEFORE the ratio so a segment present in only one fact
    # yields 0-valued measures on both engine and oracle sides
    rev0 = F.coalesce("order_revenue", F.lit(0.0))
    return j.select(
        "segment",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        rev0.alias("order_revenue"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("event_value", F.lit(0.0)).alias("event_value"),
        _fround(
            rev0 / F.nullif(F.col("n_events").cast("double"), F.lit(0.0)),
            2,
        ).alias("revenue_per_event"),
    )


def q_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 EXACT integer apportionment (largest-remainder /
    Hamilton): a 10,000-unit budget allocated across segments
    proportional to revenue — floor quotas first, then the leftover
    units go to the largest fractional remainders (deterministic
    tiebreak). The token-budget sibling of the waterfill planner
    (token_budget_plan) for when the allocation must be integral and
    sum EXACTLY to the budget. Quotas are one IEEE division off exact
    decimal revenue; the leftover count is integer algebra over the
    |segments| aggregate."""
    budget = 10000
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        o.join(
            F.broadcast(
                c.select(
                    "c_custkey", F.col("c_mktsegment").alias("segment")
                )
            ),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("segment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)")).alias(
                "rev"
            )
        )
    )
    w_all = Window.partitionBy()
    quota = (
        F.col("rev").cast("double")
        / F.sum("rev").over(w_all).cast("double")
        * F.lit(float(budget))
    )
    based = rev.select(
        "segment",
        quota.alias("quota"),
        F.floor(quota).cast("bigint").alias("base"),
        (quota - F.floor(quota)).alias("frac"),
    )
    w_rank = Window.orderBy(F.col("frac").desc(), F.col("segment").asc())
    leftover = F.lit(budget) - F.sum("base").over(w_all)
    return based.select(
        "segment",
        _fround(F.col("quota"), 4).alias("quota"),
        (
            F.col("base")
            + (F.row_number().over(w_rank) <= leftover).cast("bigint")
        ).alias("alloc"),
    )


def q_date_dim_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 GENERATED calendar dimension (the zero-input source every
    warehouse needs): 2024's 366 days from a range generator with
    year / quarter / month / ISO week / ISO weekday / weekend /
    month-end attributes — no file scan, the generator parallelizes by
    range split. Weekday is emitted as ISO (1=Mon..7=Sun) via explicit
    arithmetic so no engine's locale or week-start convention leaks
    in."""
    days = spark.range(0, 366).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
            "d"
        )
    )
    isodow = ((F.dayofweek("d") + 5) % 7) + 1
    return days.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.year("d").cast("int").alias("year"),
        F.quarter("d").cast("int").alias("quarter"),
        F.month("d").cast("int").alias("month"),
        F.weekofyear("d").cast("int").alias("iso_week"),
        isodow.cast("int").alias("iso_dow"),
        (isodow >= 6).alias("is_weekend"),
        (F.last_day("d") == F.col("d")).alias("is_month_end"),
    )


def _crossing_pick(value_col: str, num: int, den: int) -> F.Column:
    """Exact order-statistic selection: the smallest value whose
    cumulative count/weight (column ``cw``) reaches num/den of the
    total (column ``tw``) — integer cross-multiplication, never float
    rank math. The ONE Spark-side form every quantile-cut key
    (weighted_quantiles, funnel_conversion_time, cycle_time_stages,
    winsorized_stats, backfill_plan's median) shares with its DuckDB
    oracle, so the crossing rule cannot drift per key."""
    return F.min(
        F.when(
            F.col("cw") * F.lit(den) >= F.col("tw") * F.lit(num),
            F.col(value_col),
        )
    )


def q_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 WEIGHTED quantiles per group — the quantity-weighted price
    percentiles per return flag ("the median price a UNIT actually
    sold at", not the median line), completing the quantile family
    next to grouped_quantiles (unweighted) and incremental_quantiles.
    One cumulative-weight window per group over the facts ordered by
    value; the lower weighted q-quantile is the smallest value whose
    cumulative weight reaches q*W. Weights stay decimal end to end and
    the threshold test is cross-multiplied by q's exact rational form
    (cw*den >= tw*num), so the crossing row — hence the result — is
    engine-identical with zero float rank math. Tie-order inside equal
    values cannot change the answer (the selected value is the run's
    value wherever the crossing lands). Same shuffle count as any
    per-group window; no global sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("decimal(38,12)").alias("w"),
    )
    wc = (
        Window.partitionBy("flag")
        .orderBy(F.col("v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = li.select(
        "flag",
        "v",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(Window.partitionBy("flag")).alias("tw"),
    )

    return cum.groupBy("flag").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.max("tw").cast("bigint").alias("total_qty"),
        _fround(_crossing_pick("v", 1, 2), 2).alias("wp50"),
        _fround(_crossing_pick("v", 9, 10), 2).alias("wp90"),
    )


def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Theil-Sen robust trend per event type — the median of all
    pairwise slopes of the DAILY revenue series, insensitive to ~29%
    of days being outliers where the OLS fit (ols_event_model) is not.
    The quadratic pair set is generated from the |types|x|days| daily
    AGGREGATE (~465 pairs/type for a month of days), never the raw
    facts, so the cost at any SF is one scan plus a tiny self-join.
    Daily sums are decimal-exact; each slope is one IEEE division; the
    median is the exact mean of the two middle order statistics under
    a fully deterministic (slope, d1, d2) order."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(38,18)"))
            .cast("double")
            .alias("rev")
        )
    )
    a = daily.select(
        "event_type",
        F.col("day").alias("d1"),
        F.col("rev").alias("v1"),
    )
    b = daily.select(
        "event_type",
        F.col("day").alias("d2"),
        F.col("rev").alias("v2"),
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "event_type",
            "d1",
            "d2",
            (
                (F.col("v2") - F.col("v1"))
                / F.datediff("d2", "d1").cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .alias("m"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("m") + 1) / 2))
            | (F.col("rn") == F.floor(F.col("m") / 2) + 1)
        )
        .groupBy("event_type")
        .agg(
            (F.sum("slope") / F.count("*")).alias("_sen"),
            F.max("m").cast("bigint").alias("n_pairs"),
        )
    )
    # n_pairs = C(n_days, 2) exactly, so n_days recovers algebraically
    # (sqrt of a perfect square is correctly rounded — exact): no
    # second scan of the daily aggregate, no extra join.
    return med.select(
        "event_type",
        F.floor(
            (
                F.lit(1.0)
                + F.sqrt(
                    F.lit(1.0) + F.lit(8.0) * F.col("n_pairs").cast("double")
                )
            )
            / F.lit(2.0)
        )
        .cast("bigint")
        .alias("n_days"),
        "n_pairs",
        _fround(F.col("_sen"), 4).alias("sen_slope"),
    )


def q_mann_whitney_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 nonparametric A/B readout: Mann-Whitney U with tie
    correction — the rank-sum complement of ab_test_report's Welch t
    for skewed per-user value distributions (same md5-band arms).
    SCALE-CORRECT RANKING: no global row_number over users — per-user
    values aggregate to per-VALUE counts, one cumulative window over
    the |distinct values| aggregate assigns exact average ranks, and
    every quantity through 2U stays an exact integer (ranks are
    integers-plus-halves, carried doubled): the tie-corrected normal z
    is the only IEEE step. Per-user values are grouped as decimals so
    value equality is engine-exact. At 100x the |distinct values|
    window is the lever — it rides the same two-phase prefix-sum
    rewrite max_concurrency uses."""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(38,18)")).alias("uv")
        )
        .withColumn(
            "arm",
            F.when(
                _hash_prefix(F.col("user_id")) < "8000", "A"
            ).otherwise("B"),
        )
    )
    vals = per_user.groupBy("uv").agg(
        F.count("*").cast("decimal(38,0)").alias("t"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("ta"),
    )
    w_cum = Window.orderBy("uv").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = vals.select(
        "t",
        "ta",
        F.coalesce(F.sum("t").over(w_cum), F.lit(0))
        .cast("decimal(38,0)")
        .alias("cb"),
    )
    # doubled average rank: 2*rank = 2*cum_before + t + 1 (integer)
    r2 = 2 * F.col("cb") + F.col("t") + 1
    agg = ranked.agg(
        F.sum("t").cast("decimal(38,0)").alias("n"),
        F.sum("ta").cast("decimal(38,0)").alias("na"),
        F.sum(F.col("ta") * r2).cast("decimal(38,0)").alias("ra2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("decimal(38,0)").alias("tie3"),
    )
    n = F.col("n").cast("double")
    na = F.col("na").cast("double")
    nb = (F.col("n") - F.col("na")).cast("double")
    # 2*U_A = sum(2*rank_A) - nA*(nA+1)  (exact integer)
    u2 = (
        F.col("ra2") - F.col("na") * (F.col("na") + 1)
    ).cast("double")
    mu2 = na * nb  # 2*mu = nA*nB
    sigma2 = (
        na * nb / F.lit(12.0)
    ) * (
        (n + 1)
        - F.col("tie3").cast("double") / (n * (n - F.lit(1.0)))
    )
    z = (u2 - mu2) / (F.lit(2.0) * F.sqrt(sigma2))
    return agg.select(
        F.col("na").cast("bigint").alias("n_a"),
        (F.col("n") - F.col("na")).cast("bigint").alias("n_b"),
        (u2 / F.lit(2.0)).alias("u_a"),
        _fround(z, 4).alias("z"),
        _fround(F.lit(1.0) - u2 / (na * nb), 4).alias(
            "rank_biserial"
        ),
    )


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 difference-in-differences estimator — the panel-causal
    workhorse next to ab_test_report: treatment arm = the engine's
    deterministic md5 hash band of user_id, period = pre/post a
    mid-series cutover, outcome = purchase value. ONE
    conditional-aggregation pass over the facts renders all four
    (arm x period) cells' decimal-exact moments; the DiD point
    estimate and its pooled SE are scalar algebra on the single
    4-cell row. (Hash-randomized arms mean the true effect is 0 —
    the key exercises the estimator on null data.)"""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix

    ev = load_table(spark, sf_dir, "events")
    d = ev.filter(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
    ).select(
        F.when(_hash_prefix(F.col("user_id")) < "8000", 1)
        .otherwise(0)
        .alias("treat"),
        (F.col("ts") >= F.lit("2024-01-16")).cast("int").alias("post"),
        F.col("value").alias("y"),
    )

    def cell(tr: int, po: int, e):
        return F.sum(
            F.when(
                (F.col("treat") == tr) & (F.col("post") == po), e
            ).cast("decimal(38,18)")
        ).cast("double")

    aggs = []
    for tr in (0, 1):
        for po in (0, 1):
            sfx = f"{'t' if tr else 'c'}{po}"
            aggs += [
                cell(tr, po, F.lit(1)).alias("n_" + sfx),
                cell(tr, po, F.col("y")).alias("s_" + sfx),
                cell(tr, po, F.col("y") * F.col("y")).alias(
                    "q_" + sfx
                ),
            ]
    g = d.agg(*aggs)
    m = {
        sfx: F.col("s_" + sfx) / F.col("n_" + sfx)
        for sfx in ("c0", "c1", "t0", "t1")
    }
    var = {
        sfx: (
            F.col("q_" + sfx) / F.col("n_" + sfx) - m[sfx] * m[sfx]
        )
        * (F.col("n_" + sfx) / (F.col("n_" + sfx) - F.lit(1.0)))
        for sfx in ("c0", "c1", "t0", "t1")
    }
    did = (m["t1"] - m["t0"]) - (m["c1"] - m["c0"])
    se = F.sqrt(
        sum(var[sfx] / F.col("n_" + sfx) for sfx in var)
    )
    out = g.select(
        *[
            F.col("n_" + sfx).cast("bigint").alias("n_" + sfx)
            for sfx in ("c0", "c1", "t0", "t1")
        ],
        *[
            _fround(m[sfx], 4).alias("mean_" + sfx)
            for sfx in ("c0", "c1", "t0", "t1")
        ],
        _fround(did, 4).alias("did"),
        _fround(se, 4).alias("se"),
        _fround(did / se, 4).alias("t_stat"),
    )
    return out


def q_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 EWMA control chart over daily event volume per type —
    cusum_drift's EWMA sibling for drift that drifts back. The
    trailing-16-day exponentially weighted mean uses EXACT rational
    weights 2^(15-k) built with shiftleft — never libm pow, which is
    not correctly rounded across engines — so the weighted sum and its
    normalizer are exact integers < 2^53 and the EWMA is ONE
    correctly-rounded IEEE division, engine-identical. The window
    pairs come from a bounded 16-wide self-join on the row-indexed
    |types|x|days| daily aggregate (gap-proof), never the raw facts.
    A day alarms when its count deviates from the PRIOR window's EWMA
    by more than 3 global-series sigma (moments-exact)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("x"))
    return _ewma_chart(daily)


def _ewma_chart(daily: DataFrame) -> DataFrame:
    """Render the EWMA control chart from a (event_type, day, x) daily
    relation — shared by the batch key and its streaming-maintenance
    sibling so the chart math cannot drift between them. The daily
    aggregate is materialized once (it feeds the self-join twice plus
    the sigma branch — without the cut the batch key re-aggregates the
    facts three times; the relation is |types|x|days|, trivially
    small)."""
    daily = daily.localCheckpoint(eager=True)
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(w))
    cur = idx.select("event_type", "day", "x", "i")
    pri = idx.select(
        "event_type",
        F.col("i").alias("j"),
        F.col("x").alias("xj"),
    )
    pairs = cur.join(pri, "event_type").filter(
        (F.col("j") >= F.col("i") - 16) & (F.col("j") <= F.col("i") - 1)
    )
    wt = F.expr(
        "shiftleft(CAST(1 AS BIGINT), 15 - CAST(i - 1 - j AS INT))"
    )
    ew = pairs.groupBy("event_type", "day", "x").agg(
        F.sum((F.col("xj") * wt).cast("decimal(38,0)")).alias("s"),
        F.sum(wt.cast("decimal(38,0)")).alias("den"),
    )
    sd_src = daily.groupBy("event_type").agg(
        F.count("*").cast("double").alias("nn"),
        F.sum(F.col("x").cast("decimal(38,0)"))
        .cast("double")
        .alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("qx"),
    )
    sd = sd_src.select(
        "event_type",
        F.sqrt(
            (
                F.col("qx") / F.col("nn")
                - (F.col("sx") / F.col("nn"))
                * (F.col("sx") / F.col("nn"))
            )
            * (F.col("nn") / (F.col("nn") - F.lit(1.0)))
        ).alias("sigma"),
    )
    ewma = F.col("s").cast("double") / F.col("den").cast("double")
    joined = (
        daily.join(ew.select("event_type", "day", "s", "den"),
                   ["event_type", "day"], "left")
        .join(F.broadcast(sd), "event_type")
    )
    return joined.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        _fround(ewma, 4).alias("ewma_prior"),
        F.coalesce(
            F.abs(F.col("x").cast("double") - ewma)
            > F.lit(3.0) * F.col("sigma"),
            F.lit(False),
        ).alias("alarm"),
    )


def q_geo_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 LARGE x LARGE bounded-radius nearest-neighbor geo join —
    the scale path haversine_nearest (25-row broadcast dim) doesn't
    need: both sides here are fact-sized, so candidates come from a
    lat/lon GRID equi-join instead of a cross join. Coverage proof for
    R=500 km over |lat| <= 56: dlat <= 500/111.19 = 4.50 deg < 5-deg
    lat cells; dlon <= 500/(111.19*cos(56 deg)) = 8.04... bounded by
    the data's |lat| <= 55: 7.84 deg < 8-deg lon cells — so any
    within-radius pair differs by <= 1 cell per axis, and expanding
    the supplier side by its 3x3 cell neighborhood (explode, lon
    wrapped mod 45) makes the equi-join candidate-complete. Distance
    ranks on the 0.1-km-rounded value with a key tiebreak so libm
    sin/cos ulp differences can't flip the winner (the
    haversine_nearest convention)."""
    R = 500.0
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            (F.lit(-55.0) + (F.col("c_custkey") % 110).cast("double")).alias(
                "c_lat"
            ),
            (
                F.lit(-180.0) + ((F.col("c_custkey") * 7) % 360).cast("double")
            ).alias("c_lon"),
        )
        .withColumn(
            "gl_lat", F.floor((F.col("c_lat") + 90.0) / 5.0).cast("int")
        )
        .withColumn(
            "gl_lon", F.floor((F.col("c_lon") + 180.0) / 8.0).cast("int")
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            (F.lit(-55.0) + (F.col("s_suppkey") % 110).cast("double")).alias(
                "s_lat"
            ),
            (
                F.lit(-180.0)
                + ((F.col("s_suppkey") * 11) % 360).cast("double")
            ).alias("s_lon"),
        )
        .withColumn(
            "sl_lat", F.floor((F.col("s_lat") + 90.0) / 5.0).cast("int")
        )
        .withColumn(
            "sl_lon", F.floor((F.col("s_lon") + 180.0) / 8.0).cast("int")
        )
    )
    offs = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("int").alias("dlat"),
        (F.floor(F.col("id") / 3) - 1).cast("int").alias("dlon"),
    )
    s9 = supp.crossJoin(F.broadcast(offs)).select(
        "s_suppkey",
        "s_lat",
        "s_lon",
        (F.col("sl_lat") + F.col("dlat")).alias("gl_lat"),
        F.pmod(F.col("sl_lon") + F.col("dlon"), F.lit(45)).alias("gl_lon"),
    )
    cand = cust.join(s9, ["gl_lat", "gl_lon"])
    sdlat = F.sin(F.radians(F.col("s_lat") - F.col("c_lat")) / 2)
    sdlon = F.sin(F.radians(F.col("s_lon") - F.col("c_lon")) / 2)
    a = (
        sdlat * sdlat
        + F.cos(F.radians("c_lat")) * F.cos(F.radians("s_lat")) * sdlon * sdlon
    )
    dist = _fround(F.lit(12742.0) * F.asin(F.sqrt(a)), 1)
    scored = cand.select(
        "c_custkey", "s_suppkey", dist.alias("dist_km")
    ).filter(F.col("dist_km") <= F.lit(R))
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("dist_km").asc(), F.col("s_suppkey").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "dist_km")
    )


def q_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 PRICE-VOLUME-MIX waterfall (the FP&A bridge report): the
    year-over-year revenue change per brand decomposed into price
    effect (p1-p0)*q0, volume effect p0*(q1-q0), and the cross/mix
    term (p1-p0)*(q1-q0) — the three sum exactly (in IEEE, identically
    on both engines) to p1*q1 - p0*q0. Each period aggregates the
    facts ONCE to the brand grain (decimal revenue/quantity sums);
    average prices and effects are scalar algebra on the
    |brands|-sized merge. Brands must trade in both periods (inner
    merge) — a one-sided brand has no decomposition."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    facts = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.year("l_shipdate").alias("yr"),
        "l_quantity",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "net"
        ),
    )

    def per_year(yr: int, sfx: str) -> DataFrame:
        return (
            facts.filter(F.col("yr") == yr)
            .groupBy("p_brand")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(38,12)"))
                .cast("double")
                .alias("q" + sfx),
                F.sum(F.col("net").cast("decimal(38,12)"))
                .cast("double")
                .alias("r" + sfx),
            )
        )

    j = per_year(1996, "0").join(per_year(1997, "1"), "p_brand")
    p0 = F.col("r0") / F.col("q0")
    p1 = F.col("r1") / F.col("q1")
    return j.select(
        "p_brand",
        _fround(F.col("r0"), 2).alias("rev_1996"),
        _fround(F.col("r1"), 2).alias("rev_1997"),
        _fround((p1 - p0) * F.col("q0"), 2).alias("price_effect"),
        _fround(p0 * (F.col("q1") - F.col("q0")), 2).alias("volume_effect"),
        _fround(
            (p1 - p0) * (F.col("q1") - F.col("q0")), 2
        ).alias("mix_effect"),
    )


def q_stl_decompose_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 seasonal-trend decomposition (STL-lite) of the daily
    revenue series per event type: trend = centered 7-day moving
    average (null until the window is full), weekday seasonal = mean
    detrended value per ISO weekday slot, residual = the rest. The
    facts collapse once to the |types|x|days| daily aggregate; every
    window after that runs on the aggregate. The trend average sums
    DECIMAL daily values (exact) with ONE division; seasonal means
    decimal-cast the detrended doubles so cross-row addition order
    can't leak engine differences. ISO weekday via explicit
    arithmetic (the date_dim_gen convention)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(38,12)")).alias("rev_d")
        )
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    with_trend = daily.select(
        "event_type",
        "day",
        F.col("rev_d").cast("double").alias("x"),
        F.when(
            F.count("*").over(w7) == 7,
            F.sum("rev_d").over(w7).cast("double") / F.lit(7.0),
        ).alias("trend"),
        (((F.dayofweek("day") + 5) % 7) + 1).cast("int").alias("dow"),
    )
    det = with_trend.withColumn(
        "detrended", F.col("x") - F.col("trend")
    )
    w_dow = Window.partitionBy("event_type", "dow")
    seasonal = (
        F.sum(F.col("detrended").cast("decimal(38,12)"))
        .over(w_dow)
        .cast("double")
        / F.count("detrended").over(w_dow).cast("double")
    )
    out = det.withColumn("seasonal", seasonal)
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        _fround(F.col("x"), 2).alias("revenue"),
        _fround(F.col("trend"), 2).alias("trend"),
        _fround(F.col("seasonal"), 2).alias("seasonal"),
        _fround(
            F.col("x") - F.col("trend") - F.col("seasonal"), 2
        ).alias("residual"),
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


def q_survivorship_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 MDM SURVIVORSHIP (golden-record merge) — what happens
    AFTER record_linkage says two records are the same entity:
    per-attribute merge rules produce one golden row per cluster.
    Rules exercised: longest-then-lexicographic-last name (struct-max,
    one agg), source-precedence balance (lowest record key wins,
    struct-min), numeric max balance, and MODE segment (a second
    (cluster, value) aggregation, struct-max on (count, value) with a
    deterministic tie). Two keyed aggregations total — no window over
    the facts, no per-cluster job; every rule is an exact integer /
    string comparison so the golden row is engine-identical."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
        (
            F.col("c_nationkey").cast("bigint") * 50
            + F.regexp_extract("c_name", r"(\d+)", 1).cast("bigint") % 50
        ).alias("cluster_id"),
    )
    base = c.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.max(
            F.struct(
                F.length("c_name").alias("l"), F.col("c_name").alias("v")
            )
        )["v"].alias("name_golden"),
        F.min(
            F.struct(
                F.col("c_custkey").alias("k"),
                F.col("c_acctbal").alias("v"),
            )
        )["v"].alias("acctbal_primary"),
        F.max("c_acctbal").alias("acctbal_max"),
    )
    seg_counts = c.groupBy("cluster_id", "c_mktsegment").agg(
        F.count("*").alias("cnt")
    )
    seg_mode = seg_counts.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col("cnt").alias("c"), F.col("c_mktsegment").alias("v")
            )
        )["v"].alias("segment_mode")
    )
    return base.join(seg_mode, "cluster_id").select(
        "cluster_id",
        "n_records",
        "name_golden",
        _fround(F.col("acctbal_primary"), 2).alias("acctbal_primary"),
        "segment_mode",
        _fround(F.col("acctbal_max"), 2).alias("acctbal_max"),
    )


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 RFM SEGMENTATION (the canonical marketing cut): per
    customer recency (days from last order to the corpus anchor),
    frequency (orders) and monetary (decimal spend), quintile-scored
    by three ntile windows with a key tiebreak so bucket boundaries
    are a TOTAL order (engine-identical), then CASE-labelled into the
    classic segments and reported at segment grain. One fact
    aggregation to customer grain; scores are windows over that
    aggregate; the anchor rides a 1-row broadcast (no eager
    collect)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").cast("bigint").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(38,12)")).alias("mon"),
    )
    # one fact scan: the customer rollup feeds both the anchor (its
    # max last_order IS the corpus max order date) and the scores
    per_cust = per_cust.localCheckpoint(eager=True)
    anchor = per_cust.agg(F.max("last_order").alias("anchor"))
    rfm = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("anchor", "last_order").cast("int").alias("recency_d"),
        "freq",
        "mon",
    )

    def score(order_cols) -> F.Column:
        return F.ntile(5).over(Window.orderBy(*order_cols)).cast("int")

    scored = rfm.select(
        "o_custkey",
        "recency_d",
        "freq",
        "mon",
        # stale first -> ntile 1; most recent lands in bucket 5
        score([F.col("recency_d").desc(), F.col("o_custkey").asc()]).alias(
            "r_score"
        ),
        score([F.col("freq").asc(), F.col("o_custkey").asc()]).alias(
            "f_score"
        ),
        score([F.col("mon").asc(), F.col("o_custkey").asc()]).alias(
            "m_score"
        ),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating"
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "new")
        .otherwise("regular")
    )
    return (
        scored.withColumn("segment", seg)
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            _fround(
                F.sum("mon").cast("double")
                / F.count("*").cast("double"),
                2,
            ).alias("avg_monetary"),
            _fround(
                F.sum(F.col("recency_d").cast("decimal(38,0)"))
                .cast("double")
                / F.count("*").cast("double"),
                2,
            ).alias("avg_recency_d"),
        )
    )


def q_gains_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 GAINS/LIFT table (the campaign-targeting evaluation next
    to model_auc / calibration_ece): customers ranked by a score
    (account balance as the deterministic model stand-in) into deciles
    via ntile with a key tiebreak, labelled by late-period purchase
    activity; per decile the response rate, cumulative gain (share of
    all responders captured so far) and lift vs the base rate. The
    label join is a fact semi-join aggregated to customer grain; every
    ratio is exact-integer division rendered identically on both
    engines; the cumulative window runs over 10 rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    resp = (
        o.filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
        .select("o_custkey")
        .distinct()
        .withColumn("label", F.lit(1))
    )
    scored = c.select("c_custkey", "c_acctbal").join(
        resp, c["c_custkey"] == resp["o_custkey"], "left"
    ).select(
        "c_custkey",
        "c_acctbal",
        F.coalesce("label", F.lit(0)).alias("label"),
    )
    dec = scored.select(
        "label",
        F.ntile(10)
        .over(
            Window.orderBy(
                F.col("c_acctbal").desc(), F.col("c_custkey").asc()
            )
        )
        .cast("int")
        .alias("decile"),
    )
    per_dec = dec.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("n_resp"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return per_dec.select(
        "decile",
        "n",
        "n_resp",
        _fround(
            F.col("n_resp").cast("double") / F.col("n").cast("double"), 4
        ).alias("resp_rate"),
        _fround(
            F.sum("n_resp").over(w_cum).cast("double")
            / F.sum("n_resp").over(w_all).cast("double"),
            4,
        ).alias("cum_gain"),
        _fround(
            (F.col("n_resp").cast("double") / F.col("n").cast("double"))
            / (
                F.sum("n_resp").over(w_all).cast("double")
                / F.sum("n").over(w_all).cast("double")
            ),
            4,
        ).alias("lift"),
    )


def q_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1/§2.10 BACKFILL planner (the ops operator the reference's
    daily loop needs when a day fails silently): the expected
    (type, day) grid is the CALENDAR-month date spine the data claims
    to cover (month-start of the min day to month-end of the max day —
    a partial final day of ingest shows up as 'missing') crossed with
    the type dim; days MISSING from the facts and days whose volume
    collapsed below three quarters of the type's median daily volume
    (exact lower median via the crossing-row rank — integer
    cross-multiplication, no float thresholds) become plan rows. The
    spine is generated (sequence), the grid is |types|x|days|, and
    the facts aggregate once — the audit never rescans history per
    type."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    # |types|x|days| aggregate feeds span, the type dim, the median
    # and the audit join — materialize once instead of 4 fact scans
    daily = daily.localCheckpoint(eager=True)
    span = daily.agg(
        F.trunc(F.min("day"), "month").alias("lo"),
        F.last_day(F.max("day")).alias("hi"),
    )
    spine = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    grid = daily.select("event_type").distinct().crossJoin(
        F.broadcast(spine)
    )
    # exact lower median of daily volume per type: smallest n whose
    # rank reaches half the day count (cross-multiplied integers)
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("n", "day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    med = (
        daily.select(
            "event_type",
            "n",
            F.count("*").over(w_cum).alias("cw"),
            F.count("*")
            .over(Window.partitionBy("event_type"))
            .alias("tw"),
        )
        .groupBy("event_type")
        .agg(_crossing_pick("n", 1, 2).alias("median_n"))
    )
    audit = (
        grid.join(daily, ["event_type", "day"], "left")
        .join(F.broadcast(med), "event_type")
        .withColumn(
            "issue",
            F.when(F.col("n").isNull(), "missing").when(
                F.col("n") * 4 < F.col("median_n") * 3, "low_volume"
            ),
        )
        .filter(F.col("issue").isNotNull())
    )
    return audit.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "issue",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("observed_n"),
        "median_n",
    )


def q_streaming_ewma_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + §2.10 EWMA control chart MAINTAINED BY A STREAM: events
    arrive in two date-ordered waves cut mid-day; foreachBatch
    aggregates ONLY its own wave to (type, day, n) partial counts and
    folds them ADDITIVELY into the persisted |types|x|days| state
    (counts merge by sum — exact), guarded by the batch-id-in-meta
    replay check so crash-replay cannot double-count. The final
    render is the SAME _ewma_chart helper the batch key uses, so
    capacity monitoring never rescans raw history and the oracle is
    ewma_control_chart's SQL by construction."""
    import shutil
    import time as _time

    from aproximacion_1_etl_spark.sources.versioned import (
        committed_metas,
        current_version,
        read_snapshot,
        write_snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    base = tempfile.mkdtemp(prefix="graft_sewma_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_sewma_")
    src = os.path.join(base, "src")
    state_log = os.path.join(base, "state")

    def handle_batch(batch, batch_id: int) -> None:
        if str(batch_id) in committed_metas(state_log):
            return
        bspark = batch.sparkSession
        part = batch.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(F.count("*").cast("bigint").alias("x"))
        if current_version(state_log) is not None:
            prior = read_snapshot(bspark, state_log)
            part = (
                prior.unionByName(part)
                .groupBy("event_type", "day")
                .agg(F.sum("x").cast("bigint").alias("x"))
            )
        write_snapshot(part, state_log, meta=str(batch_id))

    try:
        # mid-DAY cut: day 16's count must merge across two batches
        cut = "2024-01-16 12:00:00"
        ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(
            os.path.join(src, "w1")
        )
        ev.filter(F.col("ts") >= cut).coalesce(1).write.parquet(
            os.path.join(src, "w2")
        )
        now = _time.time()
        for d, ts in (("w1", now - 120), ("w2", now - 60)):
            pdir = os.path.join(src, d)
            for f in os.listdir(pdir):
                os.utime(os.path.join(pdir, f), (ts, ts))
        q = (
            spark.readStream.schema(
                "event_id BIGINT, ts TIMESTAMP, event_type STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        out = _ewma_chart(read_snapshot(spark, state_log))
        return _reclaimed(out, base, ckpt)
    finally:
        if os.path.isdir(base):
            shutil.rmtree(base, ignore_errors=True)
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt, ignore_errors=True)


def _co_order_edges(
    li: DataFrame,
    max_basket: int | None = None,
    min_orders: int = 1,
) -> DataFrame:
    """Directed co-order edge list over parts (both orientations):
    (src, dst) when the two parts share >= ``min_orders`` distinct
    orders. ``max_basket`` is the wedge-volume lever shared by the
    graph family: an order with b distinct parts emits b(b-1) directed
    edges, so total volume is sum(basket²) and one hot order goes
    quadratic at a skewed 100× — orders beyond the cap are dropped
    BEFORE the self-join (where the blowup would happen), not after.
    The materialized edge list is eagerly checkpointed: every consumer
    (BFS rounds, component rounds) reuses it instead of re-running the
    per-order self-join (measured 12.2 s -> 6.0 s on bfs_hop_distance
    when the build ran per-round)."""
    op = li.select("l_orderkey", "l_partkey").distinct()
    if max_basket is not None:
        small = (
            op.groupBy("l_orderkey")
            .agg(F.count("*").alias("_b"))
            .filter(F.col("_b") <= max_basket)
            .select("l_orderkey")
        )
        op = op.join(small, "l_orderkey", "left_semi")
    a = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    pairs = a.join(b, "ok").filter(F.col("src") != F.col("dst"))
    if min_orders > 1:
        edges = pairs.groupBy("src", "dst").agg(
            F.count("*").alias("_w")
        ).filter(F.col("_w") >= min_orders).select("src", "dst")
    else:
        edges = pairs.select("src", "dst").distinct()
    return edges.localCheckpoint(eager=True)


def _geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic INTEGER customer coordinates (same key-derived spread
    as geo_grid_knn, kept integral so exact-arithmetic geometry is
    engine-identical): px in [-180, 179], py in [-55, 54]."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.lit(-180) + (F.col("c_custkey") * 7) % 360).cast("bigint")
        .alias("px"),
        (F.lit(-55) + F.col("c_custkey") % 110).cast("bigint")
        .alias("py"),
    )


def q_morton_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Z-ORDER (Morton) spatial cells as a queryable id
    (functions/geo.py::morton_sql — the same curve the zorder_snapshot
    layout clusters by, surfaced for analytics): coordinates quantize
    to 9-bit integers, bits interleave into an 18-bit cell code, and
    the multi-level rollup is PREFIX arithmetic — the level-6 cell is
    code >> 6, its level-3 parent code >> 12 — so a cell hierarchy
    costs zero re-bucketing at any resolution. min/max of the full
    code per cell demonstrate Z-locality (children are contiguous code
    ranges — the property that turns spatial range queries into few
    scan ranges at 100 TB). One aggregation; the bit math is a shared
    generated expression, drift-proof between engines."""
    from aproximacion_1_etl_spark.functions.geo import morton_sql

    pts = _geo_points(spark, sf_dir).select(
        "c_custkey",
        (F.col("px") + 180).alias("qx"),  # 0..359 < 2^9
        (F.col("py") + 90).alias("qy"),  # 35..144 < 2^9
    )
    code = F.expr(morton_sql("qx", "qy", bits=9))
    return (
        pts.select(code.alias("code"))
        .groupBy(F.shiftright("code", 6).alias("cell6"))
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.min("code").cast("bigint").alias("min_code"),
            F.max("code").cast("bigint").alias("max_code"),
        )
        .select(
            F.col("cell6").cast("bigint").alias("cell6"),
            F.shiftright("cell6", 6).cast("bigint").alias("cell3"),
            "n_points",
            "min_code",
            "max_code",
        )
    )


_PIP_POLYGONS = [
    # convex diamonds spread over the synthetic coordinate range
    (j, (j * 60 - 90, j * 20 - 30, 20 + 10 * j)) for j in range(4)
]


def q_point_in_polygon_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5/§2.10 POINT-IN-POLYGON enrichment join (the geofence /
    zone-assignment shape): customers counted into 4 fixed polygon
    zones by even-odd ray casting, unrolled per edge with the
    DIVISION-FREE crossing test (functions/geo.py::
    point_in_polygon_sql — cross-multiplied, dy-sign-aware, exact on
    integer coordinates; the builder is shared with the oracle, so
    both engines evaluate identical comparisons). The polygon side is
    a HANDFUL of literals, so the whole join is ONE aggregation pass
    over the points with |polygons| conditional sums — the broadcast-
    dim geometry join shape; at real scale the per-polygon conditions
    come from the same builder over the broadcast polygon table."""
    from aproximacion_1_etl_spark.functions.geo import (
        diamond,
        point_in_polygon_sql,
    )

    pts = _geo_points(spark, sf_dir)
    aggs, structs = [], []
    for j, (cx, cy, r) in _PIP_POLYGONS:
        cond = F.expr(point_in_polygon_sql("px", "py", diamond(cx, cy, r)))
        aggs.append(
            F.sum(cond.cast("int")).cast("bigint").alias(f"_n{j}")
        )
        aggs.append(
            F.sum(F.when(cond, F.col("c_custkey")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"_s{j}")
        )
        structs.append(
            F.struct(
                F.lit(j).cast("int").alias("polygon_id"),
                F.col(f"_n{j}").alias("n_points"),
                F.col(f"_s{j}").alias("sum_keys"),
            )
        )
    wide = pts.agg(*aggs)
    return wide.select(F.explode(F.array(*structs)).alias("r")).select(
        "r.polygon_id", "r.n_points", "r.sum_keys"
    )


def q_bfs_hop_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 graph BFS hop distance (completes the graph family next
    to pagerank / triangles / components / Adamic-Adar): minimum hops
    from a seed part set (one brand) over the co-order graph (parts
    appearing in the same order). Three frontier expansions, each ONE
    join against the distinct edge list + an anti-join against the
    labeled set, with an eager lineage cut per round so the plan never
    re-derives prior frontiers — the pagerank loop shape
    (operators/graph.py::bfs_hops). Edge volume is sum(basket²): the
    WIRED max_basket=64 lever drops orders with more distinct parts
    than the cap from edge generation before the self-join (inactive
    at tested SFs — max basket is 17 at sf0.1 — but ONE hot order on a
    skewed 100× graph otherwise emits a quadratic clique; the oracle
    mirrors the cap, and graph_degree_cap_report quantifies the
    ladder). BFS order guarantees min-distance labels, matching the
    oracle's min(d) over the bounded-depth recursion."""
    from aproximacion_1_etl_spark.operators.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    edges = _co_order_edges(li, max_basket=64)
    seeds = p.filter(F.col("p_brand") == "Brand#11").select(
        F.col("p_partkey").alias("pk")
    )
    # edges already materialized by _co_order_edges — don't pay a
    # second checkpoint of the same relation
    state = bfs_hops(edges, seeds, max_hops=3, materialize_edges=False)
    return state.select(
        F.col("pk").cast("bigint").alias("p_partkey"),
        F.col("dist").cast("int").alias("dist"),
    )


def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 named connected components (generalizes the LSH-pair CC
    inside dup_clusters to any edge relation —
    operators/graph.py::connected_components): components of the
    STRONG co-order graph (parts sharing >= 2 distinct orders, so an
    edge means repeated association, not one-off co-purchase), each
    node labeled with the minimum part key reachable from it.

    Plan: the shared _co_order_edges build (max_basket=64 wedge lever)
    feeds alternating min-label propagation with pointer jumping —
    per round ONE join + one aggregate + one |V| shortcut self-join,
    eager lineage cut, bit-exact changed probe; rounds ~ log2(graph
    diameter) instead of diameter. The oracle is the full min-label
    transitive closure (recursive CTE), so convergence — not just
    plausible labels — is what's value-checked."""
    from aproximacion_1_etl_spark.operators.graph import (
        connected_components,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = _co_order_edges(li, max_basket=64, min_orders=2)
    labels = connected_components(edges, "src", "dst", max_iterations=20)
    return labels.select(
        F.col("node").cast("bigint").alias("p_partkey"),
        F.col("comp").cast("bigint").alias("component"),
    )


def q_graph_degree_cap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 wedge-volume capacity report — the sizing companion to
    the graph family's frequent-prune levers (adamic_adar max_degree,
    _co_order_edges max_basket): for each graph (part—supplier pivot
    degrees; co-order basket sizes) and each cap on the 8..256 ladder,
    how many pivots the cap drops and what fraction of the quadratic
    wedge volume sum(d(d-1)/2) survives. This is the report an
    operator reads to CHOOSE the cap before a 100× run — the levers
    themselves are wired into the query plans.

    Plan shape: each graph collapses to its |distinct degrees|-sized
    histogram first (one aggregate per graph over an already-distinct
    projection); the cap ladder cross-joins the tiny histogram
    (broadcast, <= ~50 rows x 6 caps) and the report reduces that.
    Wedge counts are exact integers (d(d-1) is even; DIV 2)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps_deg = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count("*").alias("d"))
        .select(F.lit("part_supplier").alias("graph"), "d")
    )
    basket = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("d"))
        .select(F.lit("co_order").alias("graph"), "d")
    )
    hist = (
        ps_deg.unionByName(basket)
        .groupBy("graph", "d")
        .agg(F.count("*").alias("n"))
    )
    caps = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(c) for c in (8, 16, 32, 64, 128, 256)])
        ).alias("cap")
    )
    wedges = F.expr("d * (d - 1) DIV 2")
    j = hist.crossJoin(F.broadcast(caps))
    kept = F.when(F.col("d") <= F.col("cap"), F.col("n") * wedges).otherwise(
        F.lit(0)
    )
    return (
        j.groupBy("graph", "cap")
        .agg(
            F.sum("n").cast("bigint").alias("pivots_total"),
            F.sum(
                F.when(F.col("d") > F.col("cap"), F.col("n")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("pivots_dropped"),
            F.sum(F.col("n") * wedges).cast("bigint").alias("wedges_total"),
            F.sum(kept).cast("bigint").alias("wedges_kept"),
            _fround(
                F.sum(kept).cast("double")
                / F.sum(F.col("n") * wedges).cast("double"),
                4,
            ).alias("kept_frac"),
        )
        .select(
            "graph",
            F.col("cap").cast("int").alias("cap"),
            "pivots_total",
            "pivots_dropped",
            "wedges_total",
            "wedges_kept",
            "kept_frac",
        )
    )


def q_bpe_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 tokenizer-quality report: per-language FERTILITY
    (tokens per word) and compression (chars per token) of the trained
    BPE tokenizer — the standard multi-lingual tokenizer-evaluation
    cut (a language with high fertility pays more context budget per
    word). Aggregates the SAME bpe_encode per-doc budgets the packing
    stages consume (one extra |docs| join + one aggregation); every
    total is an exact integer sum, each ratio one IEEE division."""
    from aproximacion_1_etl_spark.text.analysis import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode(docs, _trained_bpe_merges(spark, sf_dir))
    j = enc.join(docs.select("doc_id", "lang"), "doc_id")
    return j.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        _fround(
            F.sum("n_tokens").cast("double")
            / F.sum("n_words").cast("double"),
            4,
        ).alias("fertility"),
        _fround(
            F.sum("n_chars").cast("double")
            / F.sum("n_tokens").cast("double"),
            4,
        ).alias("chars_per_token"),
    )


def q_padding_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 context-budget WASTE report: documents assigned to the
    smallest power-of-two token bucket (64..1024, oversize truncated
    to the cap) and per bucket the padding a fixed-length batch would
    burn — the training-cost readout that justifies length-bucketed
    batching (length_bucketed_batches) over naive max-length padding.
    Same bpe_encode budgets; all totals exact integers; efficiency is
    one division."""
    from aproximacion_1_etl_spark.text.analysis import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode(docs, _trained_bpe_merges(spark, sf_dir)).select(
        "doc_id", "n_tokens"
    )
    cap = (
        F.when(F.col("n_tokens") <= 64, 64)
        .when(F.col("n_tokens") <= 128, 128)
        .when(F.col("n_tokens") <= 256, 256)
        .when(F.col("n_tokens") <= 512, 512)
        .otherwise(1024)
    )
    kept = F.least(F.col("n_tokens"), F.lit(1024))
    bucketed = enc.select(
        cap.cast("int").alias("bucket_cap"),
        kept.alias("kept"),
        (cap - kept).cast("bigint").alias("pad"),
    )
    return bucketed.groupBy("bucket_cap").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("kept").cast("bigint").alias("total_tokens"),
        F.sum("pad").cast("bigint").alias("total_padding"),
        _fround(
            F.sum("kept").cast("double")
            / (F.sum("kept") + F.sum("pad")).cast("double"),
            4,
        ).alias("efficiency"),
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


def q_classifier_prf_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 classifier evaluation: per-class PRECISION / RECALL / F1
    of the heuristic language-ID against the labeled lang column — the
    summary sheet on top of lang_confusion's raw matrix. tp/fp/fn come
    from three conditional sums over the |langs|² confusion aggregate
    (one scan, one keyed aggregation, then |cells|-sized algebra);
    ratios are nullif-guarded single divisions, identical on both
    engines."""
    from aproximacion_1_etl_spark.text.analysis import lang_id

    d = load_table(spark, sf_dir, "documents")
    cm = d.groupBy(
        F.col("lang").alias("true_lang"),
        lang_id(F.col("text")).alias("pred_lang"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    # the |langs|² matrix feeds two rollups — one lang-id scan, not two
    cm = cm.localCheckpoint(eager=True)
    per_true = cm.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n").cast("bigint").alias("n_true"),
        F.sum(
            F.when(F.col("pred_lang") == F.col("true_lang"), F.col("n"))
        )
        .cast("bigint")
        .alias("tp_t"),
    )
    per_pred = cm.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n").cast("bigint").alias("n_pred")
    )
    j = per_true.join(per_pred, "lang", "left").select(
        "lang",
        F.coalesce("tp_t", F.lit(0)).alias("tp"),
        (F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp_t", F.lit(0)))
        .cast("bigint")
        .alias("fp"),
        (F.col("n_true") - F.coalesce("tp_t", F.lit(0)))
        .cast("bigint")
        .alias("fn"),
    )
    prec = F.col("tp").cast("double") / F.nullif(
        (F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0)
    )
    rec = F.col("tp").cast("double") / F.nullif(
        (F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0)
    )
    return j.select(
        "lang",
        "tp",
        "fp",
        "fn",
        _fround(prec, 4).alias("precision"),
        _fround(rec, 4).alias("recall"),
        _fround(
            F.lit(2.0) * prec * rec / F.nullif(prec + rec, F.lit(0.0)),
            4,
        ).alias("f1"),
    )


def q_eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 EMPIRICAL-BAYES rate shrinkage (the small-cell fix every
    ratio dashboard needs): per-(segment, nation) purchase share with
    beta-binomial shrinkage toward the population — method-of-moments
    alpha/beta from the cell-rate mean/variance (decimal-cast sums so
    the moments are order-independent), then shrunk = (x + a)/(n +
    a + b). A sparse cell collapses to the prior, a dense one keeps
    its own rate — all closed form, one fact aggregation + one
    |cells| pass + a 1-row broadcast; no sampling, no iteration."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dim = F.broadcast(
        c.join(n, c["c_nationkey"] == n["n_nationkey"]).select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
        )
    )
    cells = (
        ev.join(dim, ev["user_id"] == F.col("c_custkey"))
        .groupBy("segment", "nation")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                (F.col("event_type") == "purchase").cast("int")
            )
            .cast("bigint")
            .alias("x"),
        )
    )
    rate = F.col("x").cast("double") / F.col("n").cast("double")
    rated = cells.withColumn("p", rate)
    mom = rated.agg(
        F.count("*").cast("double").alias("k"),
        F.sum(F.col("p").cast("decimal(38,18)"))
        .cast("double")
        .alias("s"),
        F.sum((F.col("p") * F.col("p")).cast("decimal(38,18)"))
        .cast("double")
        .alias("q"),
    )
    m = F.col("s") / F.col("k")
    v = (F.col("q") / F.col("k") - m * m) * (
        F.col("k") / (F.col("k") - F.lit(1.0))
    )
    common = F.greatest(
        m * (F.lit(1.0) - m) / v - F.lit(1.0), F.lit(1.0)
    )
    pri = mom.select(
        (m * common).alias("alpha"),
        ((F.lit(1.0) - m) * common).alias("beta"),
    )
    out = rated.crossJoin(F.broadcast(pri))
    shrunk = (F.col("x").cast("double") + F.col("alpha")) / (
        F.col("n").cast("double") + F.col("alpha") + F.col("beta")
    )
    return out.select(
        "segment",
        "nation",
        "n",
        "x",
        _fround(F.col("p"), 6).alias("raw_rate"),
        _fround(shrunk, 6).alias("shrunk_rate"),
    )


def q_topn_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 TOP-N + OTHER rollup (the BI idiom behind every pie
    chart): top-5 brands by decimal-exact net revenue, everything else
    collapsed into one 'OTHER' row, with exact shares. One fact
    aggregation to brand grain, one rank window over the |brands|
    aggregate, one re-aggregation of the relabeled rows — facts
    scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brands = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                ).cast("decimal(38,12)")
            ).alias("rev")
        )
    )
    w = Window.orderBy(F.col("rev").desc(), F.col("p_brand").asc())
    labeled = brands.withColumn(
        "grp",
        F.when(F.row_number().over(w) <= 5, F.col("p_brand")).otherwise(
            "OTHER"
        ),
    )
    rolled = labeled.groupBy("grp").agg(
        F.sum("rev").alias("rev"),
        F.count("*").cast("bigint").alias("n_brands"),
    )
    return rolled.select(
        F.col("grp").alias("brand"),
        "n_brands",
        _fround(F.col("rev").cast("double"), 2).alias("revenue"),
        _fround(
            F.col("rev").cast("double")
            / F.sum(F.col("rev"))
            .over(Window.partitionBy())
            .cast("double"),
            6,
        ).alias("share"),
    )


def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 cross-SOURCE vocabulary overlap: pairwise Jaccard of the
    per-source token vocabularies — the corpus-mixing diagnostic
    (two sources with near-identical vocabularies add less diversity
    than their row counts suggest). The token explode aggregates to
    (token, sorted source set) ONCE; pairs are generated map-side from
    each token's source array (the basket-pair iterator — bounded by
    |sources|²/2 per token, never a vocab self-join); |A∪B| =
    |A|+|B|-|A∩B| from exact integer vocab sizes."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    ).distinct()
    # the distinct (source, token) relation feeds both the vocab sizes
    # and the per-token source sets — one explode+distinct, not two
    toks = toks.localCheckpoint(eager=True)
    sizes = toks.groupBy("source").agg(
        F.count("*").cast("bigint").alias("vocab")
    )
    tok_srcs = toks.groupBy("tok").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    ).filter(F.size("ss") >= 2)
    pairs = tok_srcs.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (x, i) ->"
                " transform(slice(ss, i + 2, size(ss)),"
                " y -> struct(x AS a, y AS b))))"
            )
        ).alias("pr")
    ).select(F.col("pr.a").alias("src_a"), F.col("pr.b").alias("src_b"))
    inter = pairs.groupBy("src_a", "src_b").agg(
        F.count("*").cast("bigint").alias("n_common")
    )
    sa = sizes.select(
        F.col("source").alias("src_a"), F.col("vocab").alias("va")
    )
    sb = sizes.select(
        F.col("source").alias("src_b"), F.col("vocab").alias("vb")
    )
    j = inter.join(F.broadcast(sa), "src_a").join(
        F.broadcast(sb), "src_b"
    )
    return j.select(
        "src_a",
        "src_b",
        "n_common",
        (F.col("va") + F.col("vb") - F.col("n_common")).alias("n_union"),
        _fround(
            F.col("n_common").cast("double")
            / (
                F.col("va") + F.col("vb") - F.col("n_common")
            ).cast("double"),
            6,
        ).alias("jaccard"),
    )


def q_scd6_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 SCD TYPE-6 (hybrid) dimension view: every type-2 validity
    interval ALSO carries the key's CURRENT attribute (the type-1
    overlay), so point-in-time joins and current-state filters hit one
    relation — the '1+2+3' hybrid Kimball catalogs. Both windows (the
    lead that closes intervals and the whole-partition last that
    overlays the current value) share the key partitioning and one
    total (ts, tiebreak) order, so Catalyst plans a single exchange
    for the whole view."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return ev.select(
        "user_id",
        "event_type",
        F.last("event_type").over(w_full).alias("event_type_current"),
        _ts_str("ts").alias("valid_from"),
        _ts_str(F.lead("ts").over(w)).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 WINSORIZED moments per series (the robust-mean complement
    of robust_stats' median/MAD): values clamped at the exact
    empirical p05/p95 — both cut points selected by the crossing-row
    rule on the per-(type, value) count aggregate (cum*20 >= tot*k
    integer cross-multiplication, so the cut can't flap between
    engines) — then decimal-exact mean/std of the clamped column. Two
    passes over the facts (cuts, then clamp+moments), the cut relation
    broadcasts back; no sort of the facts."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.col("value").cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    counts = ev.groupBy("event_type", "v").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        "event_type",
        "v",
        F.sum("c").over(w_cum).alias("cw"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("tw"),
    )
    cuts = cum.groupBy("event_type").agg(
        _crossing_pick("v", 1, 20).alias("lo_cut"),
        _crossing_pick("v", 19, 20).alias("hi_cut"),
    )
    clamped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "lo_cut",
        "hi_cut",
        F.least(F.greatest(F.col("v"), F.col("lo_cut")), F.col("hi_cut")).alias(
            "cv"
        ),
    )
    g = clamped.groupBy("event_type", "lo_cut", "hi_cut").agg(
        F.count("*").cast("double").alias("nn"),
        F.sum(F.col("cv").cast("decimal(38,18)")).cast("double").alias("s"),
        F.sum((F.col("cv") * F.col("cv")).cast("decimal(38,18)"))
        .cast("double")
        .alias("q"),
    )
    mean = F.col("s") / F.col("nn")
    std = F.sqrt(
        (F.col("q") / F.col("nn") - mean * mean)
        * (F.col("nn") / (F.col("nn") - F.lit(1.0)))
    )
    return g.select(
        "event_type",
        F.col("nn").cast("bigint").alias("n"),
        _fround(F.col("lo_cut"), 4).alias("lo_cut"),
        _fround(F.col("hi_cut"), 4).alias("hi_cut"),
        _fround(mean, 4).alias("wins_mean"),
        _fround(std, 4).alias("wins_std"),
    )


def q_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 frequent ITEM TRIPLES (the Apriori step past
    basket_rules' pairs): 3-item co-occurrence counts from map-side
    combination generation over each order's sorted item array —
    never a 3-way basket self-join. The frequent-ITEM prune (>= 3
    orders) runs first, so triple volume is sum(m'³) over PRUNED
    basket sizes — the Apriori antimonotonicity lever that keeps the
    explode bounded at 100 TB. Top-20 by exact support via
    distributed TakeOrdered under a total (support, a, b, c) order."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    freq_items = (
        op.groupBy("l_partkey")
        .agg(F.count("*").alias("nf"))
        .filter(F.col("nf") >= 3)
        .select("l_partkey")
    )
    baskets = (
        op.join(freq_items, "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("its"))
        .filter(F.size("its") >= 3)
    )
    triples = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(its, (x, i) ->"
                " flatten(transform(slice(its, i + 2, size(its)),"
                " (y, j) -> transform(slice(its, i + j + 3,"
                " size(its)), z -> struct(x AS a, y AS b,"
                " z AS c))))))"
            )
        ).alias("t")
    ).select(
        F.col("t.a").alias("a"),
        F.col("t.b").alias("b"),
        F.col("t.c").alias("c"),
    )
    counts = triples.groupBy("a", "b", "c").agg(
        F.count("*").cast("bigint").alias("support")
    )
    top = counts.orderBy(
        F.col("support").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
        F.col("c").asc(),
    ).limit(20)
    w = Window.orderBy(
        F.col("support").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
        F.col("c").asc(),
    )
    return top.select(
        "a",
        "b",
        "c",
        "support",
        F.row_number().over(w).cast("int").alias("rank"),
    )


def q_ab_sequential_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 SEQUENTIAL A/B monitoring: the daily Welch-z path of the
    running experiment against an O'Brien-Fleming-style spending
    boundary (c / sqrt(t/T), c = 2.5 exact literal) — the
    peeking-safe readout ab_test_report's single terminal test lacks.
    Facts aggregate ONCE to |days|x|arms| daily moment partials
    (decimal); cumulative windows over that aggregate produce every
    day's moments; z and the boundary are scalar IEEE algebra. One
    fact exchange + windows on the tiny aggregate."""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix

    ev = load_table(spark, sf_dir, "events")
    d = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.to_date("ts").alias("day"),
        F.when(_hash_prefix(F.col("user_id")) < "8000", "A")
        .otherwise("B")
        .alias("arm"),
        F.col("value").alias("y"),
    )
    daily = d.groupBy("day", "arm").agg(
        F.count("*").cast("decimal(38,6)").alias("n"),
        F.sum(F.col("y").cast("decimal(38,12)")).alias("s"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)")).alias(
            "q"
        ),
    )
    w_cum = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "day",
        "arm",
        F.sum("n").over(w_cum).cast("double").alias("cn"),
        F.sum("s").over(w_cum).cast("double").alias("cs"),
        F.sum("q").over(w_cum).cast("double").alias("cq"),
    )
    paired = cum.groupBy("day").agg(
        F.max(F.when(F.col("arm") == "A", F.col("cn"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("cs"))).alias("sa"),
        F.max(F.when(F.col("arm") == "A", F.col("cq"))).alias("qa"),
        F.max(F.when(F.col("arm") == "B", F.col("cn"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("cs"))).alias("sb"),
        F.max(F.when(F.col("arm") == "B", F.col("cq"))).alias("qb"),
    ).filter(
        (F.col("na") > 1) & (F.col("nb") > 1)
    )
    t_idx = Window.orderBy("day")
    total = Window.partitionBy()
    ma = F.col("na")
    mean_a = F.col("sa") / ma
    mean_b = F.col("sb") / F.col("nb")
    var_a = (F.col("qa") / ma - mean_a * mean_a) * (
        ma / (ma - F.lit(1.0))
    )
    var_b = (
        F.col("qb") / F.col("nb") - mean_b * mean_b
    ) * (F.col("nb") / (F.col("nb") - F.lit(1.0)))
    z = (mean_a - mean_b) / F.sqrt(
        var_a / ma + var_b / F.col("nb")
    )
    t = F.row_number().over(t_idx).cast("double")
    big_t = F.count("*").over(total).cast("double")
    boundary = F.lit(2.5) / F.sqrt(t / big_t)
    return paired.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        _fround(z, 4).alias("z"),
        _fround(boundary, 4).alias("boundary"),
        (F.abs(z) > boundary).alias("crossed"),
    )


def q_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 CUPED variance reduction (the industry-standard
    experiment-sensitivity fix): each user's post-period purchase
    value Y adjusted by their PRE-period value X — Y' = Y - theta*(X -
    mean X), theta = cov(X,Y)/var(X) — then the Welch z on raw vs
    adjusted metric side by side, plus the achieved variance
    reduction. Everything is closed-form moment algebra: one scan to
    per-user (x, y) decimal partials, one single-row moment pass for
    theta (1-row broadcast), one per-arm rollup. Hash-randomized arms
    mean the true effect is 0; CUPED's job here is the variance
    column."""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix

    ev = load_table(spark, sf_dir, "events")
    cut = "2024-01-16"
    per_user = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts") < cut, F.col("value")).cast(
                    "decimal(38,12)"
                )
            ).alias("_x"),
            F.sum(
                F.when(F.col("ts") >= cut, F.col("value")).cast(
                    "decimal(38,12)"
                )
            ).alias("_y"),
        )
        .select(
            "user_id",
            F.coalesce(F.col("_x"), F.lit(0)).cast("double").alias("x"),
            F.coalesce(F.col("_y"), F.lit(0)).cast("double").alias("y"),
            F.when(
                _hash_prefix(F.col("user_id")) < "8000", "A"
            ).otherwise("B").alias("arm"),
        )
    )

    def dsum(e):
        return F.sum(e.cast("decimal(38,12)")).cast("double")

    mom = per_user.agg(
        F.count("*").cast("double").alias("k"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    mx = F.col("sx") / F.col("k")
    theta = (
        F.col("sxy") / F.col("k") - mx * (F.col("sy") / F.col("k"))
    ) / (F.col("sxx") / F.col("k") - mx * mx)
    pri = mom.select(theta.alias("theta"), mx.alias("mean_x"))
    adj = per_user.crossJoin(F.broadcast(pri)).select(
        "arm",
        "y",
        (
            F.col("y")
            - F.col("theta") * (F.col("x") - F.col("mean_x"))
        ).alias("y_adj"),
        F.col("theta"),
    )
    arms = adj.groupBy("arm").agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.col("y")).alias("s1"),
        dsum(F.col("y") * F.col("y")).alias("q1"),
        dsum(F.col("y_adj")).alias("s2"),
        dsum(F.col("y_adj") * F.col("y_adj")).alias("q2"),
        F.max("theta").alias("theta"),
    )
    a = arms.filter(F.col("arm") == "A").select(
        F.col("n").alias("na"),
        F.col("s1").alias("sa1"),
        F.col("q1").alias("qa1"),
        F.col("s2").alias("sa2"),
        F.col("q2").alias("qa2"),
        "theta",
    )
    b = arms.filter(F.col("arm") == "B").select(
        F.col("n").alias("nb"),
        F.col("s1").alias("sb1"),
        F.col("q1").alias("qb1"),
        F.col("s2").alias("sb2"),
        F.col("q2").alias("qb2"),
    )
    j = a.crossJoin(F.broadcast(b))

    def welch(sa, qa, sb, qb):
        ma = F.col(sa) / F.col("na")
        mb = F.col(sb) / F.col("nb")
        va = (F.col(qa) / F.col("na") - ma * ma) * (
            F.col("na") / (F.col("na") - F.lit(1.0))
        )
        vb = (F.col(qb) / F.col("nb") - mb * mb) * (
            F.col("nb") / (F.col("nb") - F.lit(1.0))
        )
        z = (ma - mb) / F.sqrt(va / F.col("na") + vb / F.col("nb"))
        return z, va, vb

    z_raw, va1, vb1 = welch("sa1", "qa1", "sb1", "qb1")
    z_cuped, va2, vb2 = welch("sa2", "qa2", "sb2", "qb2")
    return j.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        _fround(F.col("theta"), 6).alias("theta"),
        _fround(z_raw, 4).alias("z_raw"),
        _fround(z_cuped, 4).alias("z_cuped"),
        _fround(F.lit(1.0) - (va2 + vb2) / (va1 + vb1), 4).alias(
            "var_reduction"
        ),
    )


def q_ab_sample_size_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 experiment SAMPLE-SIZE planner: required users per arm to
    detect a {1,2,5,10}% lift of the current per-user purchase-value
    mean at alpha=.05 / power=.80 — n = 2*sigma²*(1.96+0.84)²/delta²,
    the normal-approximation formula with exact z literals (no erf
    needed). Variance comes from ONE per-user moment pass; the MDE
    grid is an exploded literal array, so the whole plan is a
    |grid|-row projection off a 1-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(38,12)"))
            .cast("double")
            .alias("y")
        )
    )
    mom = per_user.agg(
        F.count("*").cast("double").alias("k"),
        F.sum(F.col("y").cast("decimal(38,12)"))
        .cast("double")
        .alias("s"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)"))
        .cast("double")
        .alias("q"),
    )
    m = F.col("s") / F.col("k")
    var = (F.col("q") / F.col("k") - m * m) * (
        F.col("k") / (F.col("k") - F.lit(1.0))
    )
    base = mom.select(
        F.col("k").alias("n_users"), m.alias("mean_y"), var.alias("var_y")
    )
    grid = base.select(
        "n_users",
        "mean_y",
        "var_y",
        F.explode(
            F.array(
                F.lit(0.01), F.lit(0.02), F.lit(0.05), F.lit(0.1)
            )
        ).alias("mde_frac"),
    )
    delta = F.col("mde_frac") * F.col("mean_y")
    # built in-engine on BOTH sides (not a Python-computed literal) so
    # the double is bit-identical across engines
    z2 = (F.lit(1.96) + F.lit(0.84)) * (F.lit(1.96) + F.lit(0.84))
    n_req = F.ceil(
        F.lit(2.0) * F.col("var_y") * z2 / (delta * delta)
    ).cast("bigint")
    return grid.select(
        _fround(F.col("mde_frac"), 2).alias("mde_frac"),
        _fround(delta, 4).alias("delta"),
        n_req.alias("n_required_per_arm"),
        (F.col("n_users") / F.lit(2.0)).cast("bigint").alias(
            "n_have_per_arm"
        ),
        (
            F.col("n_users") / F.lit(2.0)
            >= n_req.cast("double")
        ).alias("powered"),
    )


ALL_QUERIES = {
    "flagship_order_lifecycle": q_flagship_order_lifecycle,
    "bm25_topk": q_bm25_topk,
    "semantic_dedup": q_semantic_dedup,
    "lm_trigram_score": q_lm_trigram_score,
    "work_table_build": q_work_table_build,
    "m9_visit_columns": q_m9_visit_columns,
    "asof_latest_event": q_asof_latest_event,
    "range_join_events": q_range_join_events,
    "bloom_prune_join": q_bloom_prune_join,
    "per_group_ols": q_per_group_ols,
    "seasonal_anomaly": q_seasonal_anomaly,
    "table_profile": q_table_profile,
    "pivot_status": q_pivot_status,
    "grouping_sets": q_grouping_sets,
    "s8_union_schema_drift": q_s8_union_schema_drift,
    "s4_metadata_sidecar": q_s4_metadata_sidecar,
    "ann_topk_ivf": q_ann_topk_ivf,
    "streaming_sliding_counts": q_streaming_sliding_counts,
    "m1_dedup_latest": q_m1_dedup_latest,
    "m2_merge_upsert": q_m2_merge_upsert,
    "m4_latest_status": q_m4_latest_status,
    "m5_child_rollup": q_m5_child_rollup,
    "m6_case_derivation": q_m6_case_derivation,
    "m8_nth_event": q_m8_nth_event,
    "m8_last_event": q_m8_last_event,
    "m10_first_scheduled": q_m10_first_scheduled,
    "m11_visit_order": q_m11_visit_order,
    "f2_explode_roundtrip": q_f2_explode_roundtrip,
    "p3_p5_cleaning": q_p3_p5_cleaning,
    "p6_cast_ddl": q_p6_cast_ddl,
    "p7_try_timestamp": q_p7_try_timestamp,
    "p8_lenient_dates": q_p8_lenient_dates,
    "p12_json_props": q_p12_json_props,
    "s1_rest_fetch": q_s1_rest_fetch,
    "s3_s6_json_roundtrip": q_s3_s6_json_roundtrip,
    "s9_enrichment_lookup": q_s9_enrichment_lookup,
    "join_enrichment_dims": q_join_enrichment_dims,
    "join_semi_anti": q_join_semi_anti,
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "set_ops": q_set_ops,
    "window_running_sum": q_window_running_sum,
    "topk_orders": q_topk_orders,
    "pricing_summary": q_pricing_summary,
    "q3_shipping_priority": q_q3_shipping_priority,
    "q5_nation_revenue": q_q5_nation_revenue,
    "sessionize": q_sessionize,
    "q13_order_count_distribution": q_q13_order_count_distribution,
    "q17_small_qty_revenue": q_q17_small_qty_revenue,
    "q18_big_spenders": q_q18_big_spenders,
    "skew_salted_agg": q_skew_salted_agg,
    "skew_replicated_join": q_skew_replicated_join,
    "grouped_pandas_stats": q_grouped_pandas_stats,
    "s3_partitioned_pruned": q_s3_partitioned_pruned,
    "scd2_history": q_scd2_history,
    "bucketed_join_rollup": q_bucketed_join_rollup,
    "event_value_quantiles": q_event_value_quantiles,
    "top_tokens_per_lang": q_top_tokens_per_lang,
    "udtf_sentences": q_udtf_sentences,
    "streaming_dedup_keys": q_streaming_dedup_keys,
    "pandas_udf_norm": q_pandas_udf_norm,
    "q22_idle_customers": q_q22_idle_customers,
    "trailing_range_avg": q_trailing_range_avg,
    "ntile_quartiles": q_ntile_quartiles,
    "streaming_interval_join": q_streaming_interval_join,
    "streaming_interval_join_outer": q_streaming_interval_join_outer,
    "csv_roundtrip": q_csv_roundtrip,
    "rolling_hash_fingerprint": q_rolling_hash_fingerprint,
    "sql_surface": q_sql_surface,
    "orc_roundtrip": q_orc_roundtrip,
    "array_funcs": q_array_funcs,
    "streaming_stateful_sessions": q_streaming_stateful_sessions,
    "approx_distinct": q_approx_distinct,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "deterministic_sample": q_deterministic_sample,
    "train_test_split": q_train_test_split,
    "stratified_sample": q_stratified_sample,
    "corpus_clean": q_corpus_clean,
    "ngram_jaccard": q_ngram_jaccard,
    "text_profile": q_text_profile,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_topk_lsh": q_ann_topk_lsh,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
    "multimodal_features": q_multimodal_features,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_audio": q_multimodal_audio,
    "bpe_merge_pairs": q_bpe_merge_pairs,
    "embedding_quantize_int8": q_embedding_quantize_int8,
    "deletion_vector_read": q_deletion_vector_read,
    "incremental_near_dup": q_incremental_near_dup,
    "ivf_index_append": q_ivf_index_append,
    "streaming_ivf_append": q_streaming_ivf_append,
    "ann_topk_pq": q_ann_topk_pq,
    "ann_topk_ivfpq": q_ann_topk_ivfpq,
    "streaming_incremental_dedup": q_streaming_incremental_dedup,
    "streaming_windowed_counts": q_streaming_windowed_counts,
    "streaming_session_window": q_streaming_session_window,
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q7_nation_volume": q_q7_nation_volume,
    "q10_returned_items": q_q10_returned_items,
    "q12_priority_lines": q_q12_priority_lines,
    "q14_promo_revenue": q_q14_promo_revenue,
    "q16_supplier_count": q_q16_supplier_count,
    "q19_disjunctive_revenue": q_q19_disjunctive_revenue,
    "q20_promo_shippers": q_q20_promo_shippers,
    "window_lag_lead": q_window_lag_lead,
    "window_percent_rank": q_window_percent_rank,
    "window_ignore_nulls": q_window_ignore_nulls,
    "incremental_rollup": q_incremental_rollup,
    "ivm_join": q_ivm_join,
    "incremental_rollup_retract": q_incremental_rollup_retract,
    "ivm_join_rollup": q_ivm_join_rollup,
    "ivm_join_orphans": q_ivm_join_orphans,
    "incremental_quantiles": q_incremental_quantiles,
    "streaming_quantiles": q_streaming_quantiles,
    "cdf_join_maintenance": q_cdf_join_maintenance,
    "zorder_pruned_scan": q_zorder_pruned_scan,
    "streaming_ivm_join": q_streaming_ivm_join,
    "m2_merge_evolution": q_m2_merge_evolution,
    "column_profile": q_column_profile,
    "max_concurrency": q_max_concurrency,
    "skyline_pareto": q_skyline_pareto,
    "skyline_pareto_3d": q_skyline_pareto_3d,
    "incremental_skyline": q_incremental_skyline,
    "incremental_profile": q_incremental_profile,
    "streaming_profile": q_streaming_profile,
    "numeric_histogram": q_numeric_histogram,
    "streaming_max_concurrency": q_streaming_max_concurrency,
    "interpolate_missing": q_interpolate_missing,
    "join_cardinality_estimate": q_join_cardinality_estimate,
    "tfidf_top_terms": q_tfidf_top_terms,
    "frame_sample": q_frame_sample,
    "repetition_profile": q_repetition_profile,
    "decontaminate": q_decontaminate,
    "pii_scrub": q_pii_scrub,
    "m2_merge_delete": q_m2_merge_delete,
    "binary_file_source": q_binary_file_source,
    "streaming_static_enrich": q_streaming_static_enrich,
    "q4_late_ship_orders": q_q4_late_ship_orders,
    "q8_market_share": q_q8_market_share,
    "q15_top_supplier": q_q15_top_supplier,
    "q21_sole_returner": q_q21_sole_returner,
    "streaming_dedup_watermarked": q_streaming_dedup_watermarked,
    "session_window_rollup": q_session_window_rollup,
    "length_histogram": q_length_histogram,
    "map_props": q_map_props,
    "variant_props": q_variant_props,
    "listagg_statuses": q_listagg_statuses,
    "unpivot_status_counts": q_unpivot_status_counts,
    "near_dup_verified": q_near_dup_verified,
    "q2_min_cost_supplier": q_q2_min_cost_supplier,
    "q9_product_profit": q_q9_product_profit,
    "q11_part_value": q_q11_part_value,
    "dup_clusters": q_dup_clusters,
    "hll_sketch_union": q_hll_sketch_union,
    "hll_sliding_distinct": q_hll_sliding_distinct,
    "segment_overlap_sketch": q_segment_overlap_sketch,
    "merge_on_read": q_merge_on_read,
    "gated_publish": q_gated_publish,
    "snapshot_schema_evolution": q_snapshot_schema_evolution,
    "snapshot_blame": q_snapshot_blame,
    "streaming_merge_on_read": q_streaming_merge_on_read,
    "streaming_hll_maintenance": q_streaming_hll_maintenance,
    "cdf_to_scd2": q_cdf_to_scd2,
    "fd_profile": q_fd_profile,
    "multi_window_features": q_multi_window_features,
    "dq_observe": q_dq_observe,
    "prefix_filter_join": q_prefix_filter_join,
    "attribution_time_decay": q_attribution_time_decay,
    "hll_rollup": q_hll_rollup,
    "new_users_daily": q_new_users_daily,
    "ref_integrity": q_ref_integrity,
    "streaming_cms_maintenance": q_streaming_cms_maintenance,
    "grouped_quantiles": q_grouped_quantiles,
    "gap_fill_daily": q_gap_fill_daily,
    "anomaly_zscore": q_anomaly_zscore,
    "haversine_nearest": q_haversine_nearest,
    "cohort_retention": q_cohort_retention,
    "event_funnel": q_event_funnel,
    "weighted_sample": q_weighted_sample,
    "inverted_index": q_inverted_index,
    "chunk_documents": q_chunk_documents,
    "pack_sequences": q_pack_sequences,
    "table_diff": q_table_diff,
    "token_entropy": q_token_entropy,
    "dq_checks": q_dq_checks,
    "scd2_pit_join": q_scd2_pit_join,
    "bigram_pmi": q_bigram_pmi,
    "corpus_to_sequences": q_corpus_to_sequences,
    "rest_datasource": q_rest_datasource,
    "lateral_topn": q_lateral_topn,
    "recursive_cte": q_recursive_cte,
    "qualify_window_filter": q_qualify_window_filter,
    "correlated_scalar_subquery": q_correlated_scalar_subquery,
    "sql_unpivot": q_sql_unpivot,
    "containment_dedup": q_containment_dedup,
    "rest_stream_ingest": q_rest_stream_ingest,
    "morton_cells": q_morton_cells,
    "point_in_polygon_join": q_point_in_polygon_join,
    "pandas_iter_udf": q_pandas_iter_udf,
    "grouped_arrow_stats": q_grouped_arrow_stats,
    "streaming_dedup_watermark": q_streaming_dedup_watermark,
    "sentence_dedup": q_sentence_dedup,
    "log_parse": q_log_parse,
    "url_canonicalize": q_url_canonicalize,
    "collated_group": q_collated_group,
    "sql_script_chain": q_sql_script_chain,
    "dynamic_overwrite": q_dynamic_overwrite,
    "heavy_hitters_cms": q_heavy_hitters_cms,
    "approx_topk_types": q_approx_topk_types,
    "execute_immediate_param": q_execute_immediate_param,
    "auto_flatten": q_auto_flatten,
    "c4_boilerplate_filter": q_c4_boilerplate_filter,
    "cogrouped_pandas_join": q_cogrouped_pandas_join,
    "arrow_map_batches": q_arrow_map_batches,
    "xml_roundtrip": q_xml_roundtrip,
    "fuzzy_dedup_blocked": q_fuzzy_dedup_blocked,
    "robust_stats": q_robust_stats,
    "pagerank_suppliers": q_pagerank_suppliers,
    "domain_mix_resample": q_domain_mix_resample,
    "hybrid_rrf_retrieval": q_hybrid_rrf_retrieval,
    "cluster_safe_split": q_cluster_safe_split,
    "ann_recall_at_k": q_ann_recall_at_k,
    "bpe_train_merges": q_bpe_train_merges,
    "bpe_encode_corpus": q_bpe_encode_corpus,
    "training_batch_pack": q_training_batch_pack,
    "corpus_fingerprint": q_corpus_fingerprint,
    "fingerprint_diff": q_fingerprint_diff,
    "length_bucketed_batches": q_length_bucketed_batches,
    "repeated_substrings": q_repeated_substrings,
    "streaming_fingerprint_maintenance": q_streaming_fingerprint_maintenance,
    "temperature_mix_resample": q_temperature_mix_resample,
    "hard_negative_mining": q_hard_negative_mining,
    "doc_novelty": q_doc_novelty,
    "corpus_funnel": q_corpus_funnel,
    "winnowed_duplicates": q_winnowed_duplicates,
    "domain_blocklist_filter": q_domain_blocklist_filter,
    "embedding_dim_stats": q_embedding_dim_stats,
    "vocab_growth": q_vocab_growth,
    "kmeans_cluster_profile": q_kmeans_cluster_profile,
    "ann_topk_multiprobe": q_ann_topk_multiprobe,
    "lang_confusion": q_lang_confusion,
    "quality_outliers": q_quality_outliers,
    "decayed_user_value": q_decayed_user_value,
    "event_bigrams": q_event_bigrams,
    "rerank_crossencoder": q_rerank_crossencoder,
    "type_cooccurrence": q_type_cooccurrence,
    "dedup_rate_by_source": q_dedup_rate_by_source,
    "corpus_release": q_corpus_release,
    "embedding_pca_power": q_embedding_pca_power,
    "ols_event_model": q_ols_event_model,
    "k_anonymity": q_k_anonymity,
    "record_linkage": q_record_linkage,
    "token_budget_plan": q_token_budget_plan,
    "triangle_cooccurrence": q_triangle_cooccurrence,
    "quantile_normalize_scores": q_quantile_normalize_scores,
    "logreg_label_model": q_logreg_label_model,
    "naive_bayes_lang": q_naive_bayes_lang,
    "chi2_feature_selection": q_chi2_feature_selection,
    "item_similarity_topk": q_item_similarity_topk,
    "l_diversity_audit": q_l_diversity_audit,
    "attribution_last_touch": q_attribution_last_touch,
    "cusum_drift": q_cusum_drift,
    "bootstrap_ci_mean": q_bootstrap_ci_mean,
    "join_skew_report": q_join_skew_report,
    "streaming_cusum_monitor": q_streaming_cusum_monitor,
    "survival_km": q_survival_km,
    "sequence_pattern_match": q_sequence_pattern_match,
    "forget_user_cascade": q_forget_user_cascade,
    "streaming_forget_user": q_streaming_forget_user,
    "ab_test_report": q_ab_test_report,
    "psi_drift_report": q_psi_drift_report,
    "holt_forecast": q_holt_forecast,
    "model_calibration_ece": q_model_calibration_ece,
    "model_auc": q_model_auc,
    "conformal_interval": q_conformal_interval,
    "decision_stump": q_decision_stump,
    "gradient_boost_stumps": q_gradient_boost_stumps,
    "ks_drift_report": q_ks_drift_report,
    "als_rank1": q_als_rank1,
    "markov_prediction_accuracy": q_markov_prediction_accuracy,
    "isotonic_calibration": q_isotonic_calibration,
    "drift_fdr_control": q_drift_fdr_control,
    "score_correlation": q_score_correlation,
    "vocab_gini": q_vocab_gini,
    "benford_audit": q_benford_audit,
    "spearman_correlation": q_spearman_correlation,
    "basket_rules": q_basket_rules,
    "target_encode_loo": q_target_encode_loo,
    "woe_iv_binning": q_woe_iv_binning,
    "compaction_plan": q_compaction_plan,
    "kfold_cv_ols": q_kfold_cv_ols,
    "zipf_fit": q_zipf_fit,
    "asof_forward_tolerance": q_asof_forward_tolerance,
    "attribution_position": q_attribution_position,
    "ridge_path_cv": q_ridge_path_cv,
    "purged_time_split": q_purged_time_split,
    "changepoint_detect": q_changepoint_detect,
    "streaming_changepoint": q_streaming_changepoint,
    "adamic_adar_linkpred": q_adamic_adar_linkpred,
    "acf_daily": q_acf_daily,
    "revenue_concentration": q_revenue_concentration,
    "phrase_search": q_phrase_search,
    "reconciliation_report": q_reconciliation_report,
    "scd2_audit": q_scd2_audit,
    "share_of_parent": q_share_of_parent,
    "drill_across": q_drill_across,
    "budget_apportion": q_budget_apportion,
    "date_dim_gen": q_date_dim_gen,
    "weighted_quantiles": q_weighted_quantiles,
    "theilsen_trend": q_theilsen_trend,
    "mann_whitney_ab": q_mann_whitney_ab,
    "diff_in_diff": q_diff_in_diff,
    "ewma_control_chart": q_ewma_control_chart,
    "geo_grid_knn": q_geo_grid_knn,
    "price_volume_mix": q_price_volume_mix,
    "stl_decompose_lite": q_stl_decompose_lite,
    "funnel_conversion_time": q_funnel_conversion_time,
    "survivorship_golden": q_survivorship_golden,
    "rfm_segmentation": q_rfm_segmentation,
    "gains_lift_table": q_gains_lift_table,
    "backfill_plan": q_backfill_plan,
    "streaming_ewma_monitor": q_streaming_ewma_monitor,
    "bfs_hop_distance": q_bfs_hop_distance,
    "graph_components": q_graph_components,
    "graph_degree_cap_report": q_graph_degree_cap_report,
    "bpe_fertility_stats": q_bpe_fertility_stats,
    "padding_efficiency_report": q_padding_efficiency_report,
    "cycle_time_stages": q_cycle_time_stages,
    "classifier_prf_report": q_classifier_prf_report,
    "eb_shrunk_rates": q_eb_shrunk_rates,
    "topn_with_other": q_topn_with_other,
    "source_vocab_overlap": q_source_vocab_overlap,
    "scd6_view": q_scd6_view,
    "winsorized_stats": q_winsorized_stats,
    "frequent_triples": q_frequent_triples,
    "ab_sequential_monitor": q_ab_sequential_monitor,
    "cuped_adjusted_ab": q_cuped_adjusted_ab,
    "ab_sample_size_plan": q_ab_sample_size_plan,
}
