"""Shared helpers for the query catalog (mechanically moved from the
monolithic queries.py — every segment below is verbatim)."""


from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from aproximacion_1_etl_spark.sources.tables import load_table


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


_HALF_CODEBOOK_CACHE: dict[tuple, dict[int, list[float]]] = {}


def _trained_half_codebook(
    spark: SparkSession, sf_dir: str
) -> dict[int, list[float]]:
    """Codebook trained on the retrain-plan key's STORE slice
    (vec_id % 2 == 0) — the aging index whose drift
    q_ivf_retrain_plan measures as successive waves append against
    it. Memoized on (sf_dir, parquet mtime) like every model
    artifact; benched as its own ``half_codebook_train_sec`` line
    item."""
    from aproximacion_1_etl_spark.text.vector import (
        derive_n_centroids,
        train_ivf_centroids,
    )

    key = _artifact_key(sf_dir, "embeddings")
    cb = _HALF_CODEBOOK_CACHE.get(key)
    if cb is None:
        old = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % 2 == 0
        )
        cb = train_ivf_centroids(
            old, n_centroids=derive_n_centroids(old.count()), iterations=3
        )
        _HALF_CODEBOOK_CACHE[key] = cb
    return cb


_RETRAIN_CODEBOOK_CACHE: dict[tuple, dict[int, list[float]]] = {}


def _trained_retrain_codebook(
    spark: SparkSession, sf_dir: str
) -> dict[int, list[float]]:
    """The RETRAINED codebook over the appended corpus
    (vec_id % 2 == 0 plus the vec_id % 8 in {1,3,5} backlog — exactly
    the corpus whose drift flipped q_ivf_retrain_plan's verdict):
    what executing the retrain decision produces.
    q_ivf_retrain_execute measures its recall/cost against the aging
    half-corpus codebook. Memoized + benched as
    ``retrain_codebook_train_sec`` like every model artifact."""
    from aproximacion_1_etl_spark.text.vector import (
        derive_n_centroids,
        train_ivf_centroids,
    )

    key = _artifact_key(sf_dir, "embeddings")
    cb = _RETRAIN_CODEBOOK_CACHE.get(key)
    if cb is None:
        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.filter(
            (F.col("vec_id") % 2 == 0)
            | (F.col("vec_id") % 8).isin(1, 3, 5)
        )
        cb = train_ivf_centroids(
            corpus,
            n_centroids=derive_n_centroids(corpus.count()),
            iterations=3,
        )
        _RETRAIN_CODEBOOK_CACHE[key] = cb
    return cb


_HALF_PQ_BOOKS_CACHE: dict[tuple, dict] = {}


def _trained_half_pq_books(spark: SparkSession, sf_dir: str) -> dict:
    """AGING PQ subspace codebooks — trained on the retrain family's
    STORE slice (vec_id % 2 == 0), seeded from that slice's own first
    ids: 'yesterday's codes', whose ADC ranking q_pq_retrain_execute
    measures against a fresh retrain as the corpus grows. Memoized +
    benched as ``half_pq_books_train_sec``."""
    from aproximacion_1_etl_spark.text.vector import train_pq_codebooks

    key = _artifact_key(sf_dir, "embeddings")
    books = _HALF_PQ_BOOKS_CACHE.get(key)
    if books is None:
        old = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % 2 == 0
        )
        books = train_pq_codebooks(old, m=8, n_centroids=16, iterations=3)
        _HALF_PQ_BOOKS_CACHE[key] = books
    return books


def _pq_drift_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DRIFTED appended corpus of the PQ retrain pair — the store
    slice (vec_id % 2 == 0) plus the vec_id % 8 in {1,3,5} append
    waves with NEGATED vectors: the waves land in an embedding region
    the aging subspace centroids never tiled (a new encoder version /
    new domain — the drift PQ retraining exists for). Negation is
    exact in IEEE, so the shift is bit-portable to the oracle's
    list_transform mirror. ONE definition shared by the retrained-
    books builder and the measuring key so training corpus and
    measured corpus cannot drift apart."""
    emb = load_table(spark, sf_dir, "embeddings")
    store = emb.select("vec_id", "embedding")
    waves = emb.filter(
        (F.col("vec_id") % 2 != 0) & (F.col("vec_id") % 8).isin(1, 3, 5)
    ).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: -x
        ).alias("embedding"),
    )
    return store.filter(F.col("vec_id") % 2 == 0).unionByName(waves)


_RETRAIN_PQ_BOOKS_CACHE: dict[tuple, dict] = {}


def _trained_retrain_pq_books(spark: SparkSession, sf_dir: str) -> dict:
    """The RETRAINED PQ codebooks over the DRIFTED appended corpus
    (_pq_drift_corpus — the store plus negated-region waves) — what
    executing the retrain decision produces on the PQ side. Memoized
    + benched as ``retrain_pq_books_train_sec``."""
    from aproximacion_1_etl_spark.text.vector import train_pq_codebooks

    key = _artifact_key(sf_dir, "embeddings")
    books = _RETRAIN_PQ_BOOKS_CACHE.get(key)
    if books is None:
        books = train_pq_codebooks(
            _pq_drift_corpus(spark, sf_dir), m=8, n_centroids=16,
            iterations=3,
        )
        _RETRAIN_PQ_BOOKS_CACHE[key] = books
    return books


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


BLOCKLIST_DOMAINS = ["src3.example.com", "src7.example.com", "bad.example.org"]


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
    # Basket form (one fact shuffle, map-side pairwise expansion) —
    # the _capped_order_baskets plan shape: collect_set dedups (no
    # pre-distinct pass) AND applies the basket cap as a size() filter
    # (no separate count aggregate + semi-join), and the sorted array
    # emits each unordered pair once (u < v), so the dedup/min_orders
    # aggregate shuffles HALF the directed pair volume the old
    # per-order self-join exchanged. Both orientations are mirrored
    # map-side after the aggregate. The explicit repartitions keep the
    # byte-small basket relation at full width under AQE's byte-based
    # coalescing (the adamic_adar / count_triangles device) and leave
    # the checkpointed edge relation keyed on src for the per-round
    # frontier joins every consumer loop runs.
    dp = li.sparkSession.sparkContext.defaultParallelism
    per_order = (
        li.select("l_orderkey", "l_partkey")
        .repartition(dp, F.col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    if max_basket is not None:
        per_order = per_order.filter(F.size("ps") <= max_basket)
    pairs = per_order.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ps"), i + F.lit(2), F.size(F.col("ps"))
                        ),
                        lambda y: F.struct(x.alias("u"), y.alias("v")),
                    ),
                )
            )
        ).alias("e")
    ).select("e.u", "e.v")
    if min_orders > 1:
        und = (
            pairs.groupBy("u", "v")
            .agg(F.count("*").alias("_w"))
            .filter(F.col("_w") >= min_orders)
            .select("u", "v")
        )
    else:
        und = pairs.distinct()
    edges = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    return edges.repartition(dp, "src").localCheckpoint(eager=True)


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


_PIP_POLYGONS = [
    # convex diamonds spread over the synthetic coordinate range
    (j, (j * 60 - 90, j * 20 - 30, 20 + 10 * j)) for j in range(4)
]


__all__ = [
    "_fmt",
    "_fround",
    "_dsum",
    "_ts_str",
    "_reclaimed",
    "_reclaimed_dist",
    "_artifact_key",
    "_hist_bucket",
    "_cum_hist",
    "_histogram_quantile_report",
    "_IVF_CODEBOOK_CACHE",
    "_trained_codebook",
    "_orders_cdc",
    "_PQ_BOOKS_CACHE",
    "_trained_pq_books",
    "_trained_half_pq_books",
    "_pq_drift_corpus",
    "_trained_retrain_pq_books",
    "_APPEND_CODEBOOK_CACHE",
    "_trained_append_codebook",
    "_trained_half_codebook",
    "_trained_retrain_codebook",
    "_BPE_MERGES_CACHE",
    "_trained_bpe_merges",
    "BLOCKLIST_DOMAINS",
    "_run_streaming_max_concurrency",
    "_LOGREG_CACHE",
    "_logreg_feats",
    "_trained_logreg_weights",
    "_logreg_scored",
    "_hll_trailing_report",
    "_customer_cdc_waves",
    "prefix_filter_pairs",
    "fk_report",
    "_CV_MOMS",
    "_cv_fold_moments",
    "_oof_sse",
    "_changepoint_daily",
    "_merge_changepoint_states",
    "_changepoint_render",
    "scd2_audit",
    "_crossing_pick",
    "_ewma_chart",
    "_co_order_edges",
    "_geo_points",
    "_PIP_POLYGONS",
]
