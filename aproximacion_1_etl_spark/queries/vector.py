"""Query catalog — vector domain (mechanically moved from queries.py)."""


from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from aproximacion_1_etl_spark.functions.concurrency import overlap
from aproximacion_1_etl_spark.sources.tables import load_table
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
from .common import *  # noqa: F401,F403



def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: exact brute-force cosine top-k per query vector (broadcast queries, JVM array folds)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_bruteforce(emb, query_ids=[0, 1, 2, 3, 4], k=10)


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


def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 embedding compression: per-vector symmetric int8
    quantization with audit stats (checksum, saturation, reconstruction
    MSE) — the 4x memory cut for ANN candidate stages
    (text/vector.py::embedding_quantize_int8)."""
    from aproximacion_1_etl_spark.text.vector import embedding_quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_quantize_int8(emb)


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


def q_ivf_nprobe_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 IVF nprobe-LADDER PLANNER — completes the planner family
    (graph_degree_cap_report's cap ladder, lsh_band_plan's banding
    ladder): for each nprobe in {1,2,4,8}, the measured cell recall@10
    of the trained-codebook IVF index on this corpus's own exact
    top-k, and the corpus fraction those probes scan — the
    recall-vs-cost curve an operator reads to pick nprobe before a
    100-TB ANN run (text/vector.py::ivf_nprobe_plan). Exact integers
    until two final one-division ratios; oracle recomputes the
    codebook in-engine (the _ivf_cent_ctes device) and mirrors every
    rounding."""
    from aproximacion_1_etl_spark.text.vector import ivf_nprobe_plan

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_nprobe_plan(
        emb,
        query_ids=[0, 1, 2, 3, 4],
        centroids=_trained_codebook(spark, sf_dir),
    )


def q_retrieval_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 RETRIEVAL-QUALITY EVAL — the measurement gate for the
    retrieval stack (companion to ann_recall_at_k's index gate): MRR,
    precision@10, and recall of the BM25 lexical ranking and the
    hybrid RRF ranking, both judged against a semantic ground truth
    (the exact-cosine top-5 per query — the standard proxy when human
    labels are absent: how well does each cheaper system approximate
    the exact semantic neighborhood?). One broadcast-sized join +
    |Q|-row aggregate per system (text/analysis.py::retrieval_eval);
    evaluation cost is independent of corpus size because only the
    ranked lists are touched. Exact integer hit counts; one division
    per mean; decimal-summed reciprocal ranks."""
    from aproximacion_1_etl_spark.text.analysis import (
        BM25_QUERIES,
        bm25_topk,
        retrieval_eval,
        rrf_fuse,
    )
    from aproximacion_1_etl_spark.text.vector import ann_topk_bruteforce

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qids = sorted(BM25_QUERIES)
    # ONE bm25 pass and ONE brute pass at depth 20, checkpointed
    # (tiny: |Q|·20 rows each); the depth-10 ranking and the top-5
    # truth are rank FILTERS of those lists (identical by definition —
    # the top-10 of a top-20 list IS the top-10), halving the plan.
    # The two passes read disjoint tables and are independent — they
    # overlap through the driver pool (guide §2.6) so neither
    # retrieval's action tail idles the cluster.
    lex20, sem20 = overlap(
        lambda: bm25_topk(docs, BM25_QUERIES, k=20).localCheckpoint(
            eager=True
        ),
        lambda: ann_topk_bruteforce(emb, query_ids=qids, k=20)
        .withColumnRenamed("vec_id", "doc_id")
        .localCheckpoint(eager=True),
    )
    truth = sem20.filter(F.col("rank") <= 5).select("query_id", "doc_id")
    lex10 = lex20.filter(F.col("rank") <= 10).select(
        "query_id", "doc_id", "rank"
    )
    hyb10 = rrf_fuse(lex20, sem20, k=10).select(
        "query_id", "doc_id", "rank"
    )
    return retrieval_eval(
        lex10, truth, qids, "bm25", depth=10, truth_k=5
    ).unionByName(
        retrieval_eval(hyb10, truth, qids, "hybrid_rrf", depth=10, truth_k=5)
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
    old = emb.filter(F.col("vec_id") % 4 != 0)
    baseline = (
        ivf_assign_cells(old, cb)
        .groupBy("cell")
        .agg(F.count("*").alias("n_baseline"))
    )
    return ivf_index_append(
        emb.filter(F.col("vec_id") % 4 == 0),
        cb,
        baseline,
        # re-delivery guard: already-indexed ids are the store slice
        indexed_ids=old.select("vec_id"),
    )


def q_ivf_index_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 IVF INDEX DELETION — the RTBF edge of the ANN family
    (r11; completes append/retrain-plan/forget for the vector store
    the way the BM25 and cluster stores got their deletion edges): an
    RTBF wave (vec_id % 6 == 0) is removed from the maintained
    per-cell stats by re-assigning ONLY the wave map-side (cell
    assignment is a pure function of vector + codebook, so the
    decrements recover exactly the insert-time cells — no history
    scan); per-cell n_before/n_removed/n_after plus the ``emptied``
    shrink-side retrain signal come back as exact integers
    (text/vector.py::ivf_index_forget). Oracle = from-scratch cell
    census of the post-delete corpus joined against the full census —
    forget == rebuild."""
    from aproximacion_1_etl_spark.text.vector import (
        ivf_assign_cells,
        ivf_index_forget,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = _trained_append_codebook(spark, sf_dir)
    current = (
        ivf_assign_cells(emb, cb)
        .groupBy("cell")
        .agg(F.count("*").alias("n_total"))
    )
    deleted = emb.filter(F.col("vec_id") % 6 == 0)
    return ivf_index_forget(
        deleted, cb, current, indexed_ids=emb.select("vec_id")
    )


def q_ivf_retrain_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 IVF CODEBOOK DRIFT TRIGGER (VERDICT r10 task 7) — the
    decision the recall gates feed: the maintained index's codebook
    was trained on the store slice (vec_id % 2 == 0,
    _trained_half_codebook); two successive append waves arrive
    (wave 1: vec_id % 8 == 1 — a normal day; wave 2: the cumulative
    vec_id % 8 in {1,3,5} backlog) and for each the report folds the
    wave's cell populations into the store's counts and measures the
    codebook's recall probe over the appended corpus, emitting
    retrain/no-retrain WITH the measured evidence
    (text/vector.py::ivf_retrain_report). The shipped corpus flips
    the verdict between the waves: wave 1's 25% growth stays inside
    every bound (no_retrain), wave 2's 75% growth breaches the 1/2
    volume bound (retrain) — the pytest pins the flip point, and the
    DuckDB oracle re-derives the codebook in-engine (_ivf_cent_ctes
    on the store slice) and mirrors every exact-integer comparison."""
    from aproximacion_1_etl_spark.text.vector import (
        ivf_assign_cells,
        ivf_retrain_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    store = emb.filter(F.col("vec_id") % 2 == 0)
    cb = _trained_half_codebook(spark, sf_dir)
    qids = [0, 2, 4]
    # the maintained per-cell stats: assigned ONCE across both waves
    # (in production this relation is read from the index, not
    # derived) and eager-cut so neither wave re-scans the store
    base = (
        ivf_assign_cells(store, cb)
        .groupBy("cell")
        .agg(F.count("*").alias("n_baseline"))
        .localCheckpoint(eager=True)
    )
    # wave 2's appended corpus (store ∪ {1,3,5} backlog) is exactly
    # the retrain-execute corpus, and the brute-force recall ground
    # truth is codebook-independent — read the one shared memoized
    # materialization instead of re-running the brute pass here
    # (VERDICT r13 task 3). Wave 1's corpus differs; its truth stays
    # in-plan.
    waves = [
        (1, emb.filter(F.col("vec_id") % 8 == 1), None),
        (
            2,
            emb.filter((F.col("vec_id") % 8).isin(1, 3, 5)),
            _retrain_exact_topk(spark, sf_dir),
        ),
    ]

    # the two waves' evidence chains are independent (each report
    # eager-cuts its own 1-row evidence relation internally); their
    # driver-blocking evaluations overlap through the pool (guide
    # §2.6) — the maintained stats, the codebook and the shared truth
    # are materialized above, BEFORE the pool, per the memo-warm
    # invariant. Results slot in wave order, so the report is
    # row-identical.
    def _wave(wave: int, batch: DataFrame, exact):
        return ivf_retrain_report(
            store, batch, cb, qids, baseline_counts=base, exact=exact
        ).select(
            F.lit(wave).cast("int").alias("wave"),
            "evidence",
            "value",
            "bound",
            "breach",
        )

    outs = overlap(
        *[
            lambda w=wave, b=batch, e=exact: _wave(w, b, e)
            for wave, batch, exact in waves
        ]
    )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


_RETRAIN_EXACT_CACHE: dict[tuple, DataFrame] = {}


def _retrain_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The brute-force cosine top-10 ground truth over the APPENDED
    retrain corpus (store slice ∪ the cumulative %8∈{1,3,5} backlog)
    for probe queries [0, 2, 4] — codebook-independent, so the drift
    trigger's wave-2 recall probe (q_ivf_retrain_plan) and both of
    q_ivf_retrain_execute's codebook evaluations measure against the
    ONE materialization instead of each re-running the |corpus|·|Q|
    brute pass (VERDICT r13 task 3: share the ground truths between
    the plan/execute pair within a session). Memoized per (corpus,
    session) + eagerly checkpointed like the codebook artifacts;
    deterministic, so the cache never changes a result."""
    from aproximacion_1_etl_spark.text.vector import ann_topk_bruteforce

    key = (
        _artifact_key(sf_dir, "embeddings"),
        spark.sparkContext.applicationId,
    )
    cached = _RETRAIN_EXACT_CACHE.get(key)
    if cached is None:
        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.filter(
            (F.col("vec_id") % 2 == 0) | (F.col("vec_id") % 8).isin(1, 3, 5)
        )
        cached = (
            ann_topk_bruteforce(corpus, query_ids=[0, 2, 4], k=10)
            .select("query_id", "vec_id")
            .localCheckpoint(eager=True)
        )
        _RETRAIN_EXACT_CACHE[key] = cached
    return cached


def q_ivf_retrain_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 RETRAIN EXECUTION — the PAYOFF of the drift trigger
    (r11; q_ivf_retrain_plan decides, this key acts and MEASURES):
    the aging codebook (trained on the vec_id % 2 == 0 store) and the
    freshly-retrained codebook (trained on the appended corpus whose
    75% growth flipped the verdict) are evaluated side by side on the
    SAME appended corpus — measured recall@10 of each at nprobe=4
    against one shared exact ground truth, plus the probed-cell scan
    cost each pays (text/vector.py::ivf_recall_cost). One row per
    codebook, both carrying the global ``efficiency_improved`` flag:
    the exact-integer cross-multiplication
    retrained_hits·aging_scanned >= aging_hits·retrained_scanned —
    i.e. recall PER SCANNED ROW did not degrade. That is the honest
    payoff of retraining: the sqrt(n)-sized fresh codebook tiles the
    grown corpus with more, smaller cells, so the same nprobe buys
    nearly the same recall at roughly half the scanned rows (measured
    at sf0.1: 0.87 recall @ 25% of the corpus scanned before vs 0.80
    @ 11% after — the recall/cost frontier restored; an operator
    choosing iso-recall instead raises nprobe and still scans less).
    Oracle trains BOTH codebooks in-engine (the prefix-namespaced
    _ivf_cent_ctes) and mirrors every measurement."""
    from aproximacion_1_etl_spark.text.vector import ivf_recall_cost

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(
        (F.col("vec_id") % 2 == 0) | (F.col("vec_id") % 8).isin(1, 3, 5)
    )
    qids = [0, 2, 4]
    k, nprobe = 10, 4
    # the shared memoized ground truth (codebook-independent — the
    # drift trigger's wave-2 probe reads the same materialization)
    exact = _retrain_exact_topk(spark, sf_dir)
    # the two codebooks' measurement chains are independent; their
    # driver-blocking evaluations overlap through the pool (guide
    # §2.6). Both codebook memos are materialized HERE, before the
    # pool, per the memo-warm invariant; results slot by name.
    books = [
        ("aging", _trained_half_codebook(spark, sf_dir)),
        ("retrained", _trained_retrain_codebook(spark, sf_dir)),
    ]
    rows_m = overlap(
        *[
            lambda c=cb: ivf_recall_cost(
                corpus, qids, c, k=k, nprobe=nprobe, exact=exact
            ).localCheckpoint(eager=True)
            for _name, cb in books
        ]
    )
    measured = {name: df for (name, _cb), df in zip(books, rows_m)}
    nk = len(qids) * k
    recovered = (
        measured["retrained"]
        .select(
            F.col("hits").alias("_nh"),
            F.col("scanned_rows").alias("_ns"),
        )
        .crossJoin(
            measured["aging"].select(
                F.col("hits").alias("_oh"),
                F.col("scanned_rows").alias("_os"),
            )
        )
        .select(
            (
                F.col("_nh") * F.col("_os") >= F.col("_oh") * F.col("_ns")
            ).alias("efficiency_improved")
        )
    ).localCheckpoint(eager=True)
    rows = []
    for name in ("aging", "retrained"):
        rows.append(
            measured[name]
            .crossJoin(recovered)
            .select(
                F.lit(name).alias("codebook"),
                "hits",
                _fround(F.col("hits") * F.lit(1.0) / F.lit(nk), 6).alias(
                    "recall"
                ),
                "scanned_rows",
                _fround(
                    F.col("scanned_rows")
                    * F.lit(1.0)
                    / (F.lit(len(qids)) * F.col("n_total")),
                    6,
                ).alias("scan_frac"),
                "efficiency_improved",
            )
        )
    return rows[0].unionByName(rows[1])


def q_pq_retrain_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 PQ CODEBOOK DRIFT TRIGGER (r13, VERDICT r12 task 3) —
    the DECISION half of the PQ retrain pair: q_pq_retrain_execute
    measures the payoff of retraining the subspace books, but nothing
    decided WHEN; this is ``ivf_retrain_plan``'s shape pointed at the
    PQ side (text/vector.py::pq_drift_report). The aging books
    (trained on the vec_id % 2 == 0 store slice) face two appended
    waves: wave 1 is a normal day (vec_id % 8 == 1, the store's own
    distribution) and wave 2 is the cumulative NEGATED backlog
    (vec_id % 8 in {1,3,5}, mirrored into the region the drifted
    corpus lives in — q_pq_retrain_execute's drift). Each wave's
    report folds two measured evidence lines against exact bounds:

    - ``quant_error``: batch-vs-store mean reconstruction error under
      the aging books (exact 6-dp integer sums, DECIMAL
      cross-multiplied). The shipped MIRROR drift leaves this ~1.1 on
      both waves — negation preserves per-subspace quantization
      geometry almost exactly — which is precisely why a
      reconstruction-error gate ALONE is insufficient evidence and
      the probe below is not optional;
    - ``recall_probe``: measured ADC recall@10 of the aging books
      over the appended corpus vs the exact squared-L2 ground truth;
      wave 1 passes (10/30 hits >= the 3/10 bound), wave 2's ranking
      collapse breaches (6/30) and flips the verdict to retrain —
      the flip q_pq_retrain_execute then acts on.

    The pytest pins the flip point and separately drives the
    quant_error breach with a genuinely out-of-range batch; the
    DuckDB oracle re-trains the aging books in-engine
    (_pq_cent_ctes) and mirrors every error sum, distance table,
    decimal ADC sum, exact ground truth, and integer comparison."""
    from aproximacion_1_etl_spark.text.vector import pq_drift_report

    emb = load_table(spark, sf_dir, "embeddings")
    store = emb.filter(F.col("vec_id") % 2 == 0).select(
        "vec_id", "embedding"
    )
    books = _trained_half_pq_books(spark, sf_dir)
    qids = [0, 2, 1]
    drifted = _pq_drift_corpus(spark, sf_dir).join(
        store.select("vec_id"), "vec_id", "left_anti"
    )
    waves = [
        (
            1,
            emb.filter(
                (F.col("vec_id") % 2 != 0) & (F.col("vec_id") % 8 == 1)
            ).select("vec_id", "embedding"),
        ),
        (2, drifted),
    ]
    # the two waves' evidence chains are independent (each report
    # eager-cuts its own 1-row evidence relation internally); they
    # overlap through the driver pool (guide §2.6) — the books memo
    # is materialized above, before the pool, and the drifted corpus
    # is a pure lazy definition (no shared state). Results slot in
    # wave order: row-identical report.
    def _wave(wave: int, batch: DataFrame):
        return pq_drift_report(store, batch, books, qids, k=10).select(
            F.lit(wave).cast("int").alias("wave"),
            "evidence",
            "value",
            "bound",
            "breach",
        )

    outs = overlap(
        *[lambda w=wave, b=batch: _wave(w, b) for wave, batch in waves]
    )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q_pq_retrain_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 PQ RETRAIN PARITY (r12 task 7) — ivf_retrain_execute's
    measured-payoff device pointed at the PRODUCT-QUANTIZATION
    subspace codebooks: aging PQ codes degrade ADC ranking as the
    corpus grows exactly the way an aging coarse codebook degrades
    cell recall, but until now only the coarse side had a retrain
    loop. The appended waves (vec_id % 8 in {1,3,5}) arrive NEGATED
    (_pq_drift_corpus — a new encoder region the aging centroids
    never tiled; negation is exact in IEEE so the shift is
    bit-portable), which is the drift PQ retraining exists for: the
    aging books (trained + seeded on the vec_id % 2 == 0 store
    slice — _trained_half_pq_books) quantize the new region with
    far-away codewords and their ADC distances stop discriminating,
    while the retrained books (_trained_retrain_pq_books, trained on
    the drifted corpus) tile it. Both generations ADC-rank the SAME
    drifted corpus against ONE shared exact squared-L2 ground truth
    over store AND wave queries (text/vector.py::pq_recall_report /
    l2_topk_exact — L2 because that is the metric ADC approximates;
    both trainings benched as their own line items). PQ scan cost is
    generation-independent (ADC touches every code either way), so
    the payoff observable is recall alone: exact-integer hits per
    codebook and the global recall_recovered flag (measured at
    sf0.01: aging 0.20 recall vs retrained 0.35 — recovered). The
    DuckDB oracle trains BOTH generations in-engine (the
    prefix-namespaced _pq_cent_ctes) and mirrors the shift, the
    encode, the distance tables, the decimal ADC sums, and the exact
    ground truth."""
    from aproximacion_1_etl_spark.text.vector import pq_recall_report

    return pq_recall_report(
        _pq_drift_corpus(spark, sf_dir),
        query_ids=[0, 2, 1, 3],
        aging_books=_trained_half_pq_books(spark, sf_dir),
        retrained_books=_trained_retrain_pq_books(spark, sf_dir),
        k=10,
    )


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
    # ONE corpus pass: aggregate straight to the (cell, label) grain —
    # the per-cell stats the old second aggregate re-derived from a
    # SECOND full-corpus argmin scan (stats and lbl each evaluated
    # `assigned`, and the codebook-literal argmin is the key's entire
    # cost) roll up from the tiny grid instead. Decimal partial sums
    # re-sum exactly (decimal addition is exact and associative), so
    # the per-cell mean distance is bit-identical.
    grid = assigned.groupBy("cell", "label").agg(
        F.count("*").alias("n_l"),
        F.sum(F.col("d6").cast("decimal(38,18)")).alias("sd"),
    )
    wcell = Window.partitionBy("cell")
    wl = Window.partitionBy("cell").orderBy(
        F.col("n_l").desc(), F.col("label").asc()
    )
    rolled = grid.select(
        "cell",
        "label",
        "n_l",
        F.sum("n_l").over(wcell).cast("bigint").alias("n"),
        (
            F.sum("sd").over(wcell).cast("double")
            / F.sum("n_l").over(wcell)
        ).alias("md"),
    ).withColumn("rn", F.row_number().over(wl)).filter(F.col("rn") == 1)
    return rolled.select(
        F.col("cell").cast("int").alias("cell"),
        "n",
        _fround(F.col("md"), 6).alias("mean_dist"),
        F.col("label").alias("top_label"),
        F.col("n_l").cast("bigint").alias("top_label_n"),
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


def q_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 embedding whitening prep: top principal component via
    distributed Gram accumulation + driver power iteration
    (text/vector.py::pca_top_component). One corpus pass, O(dim^2)
    exchange, bounded dim x dim collect (the Gram IS the model)."""
    from aproximacion_1_etl_spark.text.vector import pca_top_component

    return pca_top_component(load_table(spark, sf_dir, "embeddings"))


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


__all__ = [
    "q_ann_cosine_topk",
    "q_ann_topk_ivf",
    "q_ann_topk_lsh",
    "q_embedding_near_dup",
    "q_embedding_near_dup_lsh",
    "q_multimodal_features",
    "q_frame_sample",
    "q_multimodal_decode",
    "q_multimodal_audio",
    "q_haversine_nearest",
    "q_semantic_dedup",
    "q_embedding_quantize_int8",
    "q_ann_topk_pq",
    "q_ann_topk_ivfpq",
    "q_ivf_nprobe_plan",
    "q_ivf_retrain_plan",
    "q_ivf_index_forget",
    "q_ivf_retrain_execute",
    "q_pq_retrain_execute",
    "q_pq_retrain_plan",
    "q_retrieval_eval_report",
    "q_ivf_index_append",
    "q_hybrid_rrf_retrieval",
    "q_ann_recall_at_k",
    "q_hard_negative_mining",
    "q_embedding_dim_stats",
    "q_kmeans_cluster_profile",
    "q_ann_topk_multiprobe",
    "q_rerank_crossencoder",
    "q_embedding_pca_power",
    "q_item_similarity_topk",
    "q_geo_grid_knn",
    "q_morton_cells",
    "q_point_in_polygon_join",
]
