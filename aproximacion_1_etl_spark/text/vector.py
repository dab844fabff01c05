"""Similarity search over embedding columns (SURVEY.md §2.10).

Operates on the ``embeddings`` table (vec_id, embedding array<float>,
label). Two paths:

- **brute-force cosine top-k** — exact baseline: broadcast the (small)
  query set against the corpus, dot product via higher-order functions
  (``zip_with`` + ``aggregate``: JVM-side, no UDF, no data movement
  beyond the broadcast), rank per query with a window.
- **LSH-bucketed top-k** — the 100 TB path: random-hyperplane signs
  bucket vectors; candidates = same-bucket (multi-probe across tables),
  exact cosine only within buckets. Turns O(Q x N) into
  O(Q x N / 2^planes x tables) at a recall cost.

Determinism: hyperplane components come from md5 of (table, plane, dim)
— no RNG, reproducible across runs and engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _fround(col: Column, n: int) -> Column:
    """Engine-portable rounding (see queries._fround)."""
    f = float(10 ** n)
    return F.floor(col * F.lit(f) + F.lit(0.5)) / F.lit(f)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def ann_topk_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    The query side is tiny => broadcast nested-loop join (no shuffle of
    the corpus). Ranking: round cosine to 9 decimals before ordering so
    ties are decided by vec_id, deterministically, independent of float
    summation order. Output (query_id, vec_id, cos_sim, rank).
    """
    emb = _as_double(embeddings, vec_col)
    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    pairs = emb.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        id_col,
        _fround(cosine_sim(F.col("qvec"), F.col(vec_col)), 9).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            _fround(F.col("cos_sim"), 4).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _hyperplane(table: int, plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-driven, engine-independent."""
    import hashlib

    h = hashlib.md5(f"{table}:{plane}:{dim}".encode()).hexdigest()
    return int(h[:8], 16) / float(2**31) - 1.0


def lsh_bucket(vec: Column, table: int, planes: int, dim: int) -> Column:
    """Random-hyperplane LSH bucket id for one hash table: the sign
    pattern of ``planes`` projections, packed into an int. Pure
    expressions — the hyperplanes are literal arrays baked into the
    plan (a few KB; broadcast-equivalent)."""
    bucket: Column = F.lit(0)
    for p in range(planes):
        plane = F.array(
            *[F.lit(_hyperplane(table, p, d)) for d in range(dim)]
        )
        proj = _dot(vec, plane)
        bucket = bucket + F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def ann_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    planes: int = 4,
    tables: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine only among same-bucket candidates
    (union over ``tables`` hash tables). The scale path: the corpus is
    scanned once per table, bucketed map-side, and the join key
    (table, bucket) fans the work out; only candidates are scored."""
    emb = _as_double(embeddings, vec_col)
    bucketed = None
    for t in range(tables):
        b = emb.select(
            id_col,
            vec_col,
            F.lit(t).alias("tbl"),
            lsh_bucket(F.col(vec_col), t, planes, dim).alias("bucket"),
        )
        bucketed = b if bucketed is None else bucketed.unionByName(b)
    queries = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        "tbl",
        "bucket",
    )
    cand = (
        bucketed.join(
            F.broadcast(queries),
            on=[
                bucketed["tbl"] == queries["tbl"],
                bucketed["bucket"] == queries["bucket"],
                bucketed[id_col] != queries["query_id"],
            ],
        )
        .select("query_id", id_col, vec_col, "qvec")
        .dropDuplicates(["query_id", id_col])
    )
    scored = cand.select(
        "query_id",
        id_col,
        _fround(cosine_sim(F.col("qvec"), F.col(vec_col)), 9).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            _fround(F.col("cos_sim"), 4).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _dist2_to_lit(vec: Column, cvec: list[float], cdot: float) -> Column:
    """Squared L2 distance to a literal centroid via the dot-product
    identity |a-c|^2 = a.a + c.c - 2 a.c (three folds -> one, since
    c.c is precomputed and a.a is shared across centroids)."""
    c = F.array(*[F.lit(float(x)) for x in cvec])
    return _dot(vec, vec) + F.lit(cdot) - 2.0 * _dot(vec, c)


def ann_topk_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus to its
    nearest centroid (inverted lists), probe only the ``nprobe`` cells
    nearest each query, exact cosine within probed cells.

    Centroids here are the first ``n_centroids`` vectors (deterministic
    stand-in for a k-means codebook — the operator shape is identical;
    swap the codebook source without touching the plan). The codebook
    is collected driver-side (bounded, it IS the model) and baked into
    the plan as literals, so cell assignment is pure codegen: NO
    shuffle, no join — each corpus row computes ``n_centroids``
    distances map-side and takes the lexicographic argmin. At 100 TB
    the corpus is scanned once; only probed-cell candidates reach the
    (broadcast) query join and the top-k window.
    """
    emb = _as_double(embeddings, vec_col)
    cents = {
        r[0]: [float(x) for x in r[1]]
        for r in emb.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .collect()
    }
    cdots = {cid: sum(x * x for x in v) for cid, v in cents.items()}

    def dist_structs(vec: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    _fround(_dist2_to_lit(vec, cents[cid], cdots[cid]), 6).alias(
                        "d"
                    ),
                    F.lit(cid).alias("cid"),
                )
                for cid in sorted(cents)
            ]
        )

    v = F.col(vec_col)
    assigned = emb.select(
        id_col,
        vec_col,
        F.array_min(dist_structs(v)).getField("cid").alias("cell"),
    )
    probes = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(
                F.slice(F.array_sort(dist_structs(v)), 1, nprobe)
            ).alias("p"),
        )
        .select("query_id", "qvec", F.col("p.cid").alias("cell"))
    )
    cand = assigned.join(
        F.broadcast(probes),
        on=[
            assigned["cell"] == probes["cell"],
            assigned[id_col] != probes["query_id"],
        ],
    ).select("query_id", id_col, vec_col, "qvec")
    scored = cand.select(
        "query_id",
        id_col,
        _fround(cosine_sim(F.col("qvec"), F.col(vec_col)), 9).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            _fround(F.col("cos_sim"), 4).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.92,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): coarse-
    cluster every embedding to its nearest IVF centroid map-side (same
    literal-codebook assignment as ann_topk_ivf — no shuffle, no join),
    then WITHIN each cell drop any vector that has a lower-id neighbor
    at cosine >= ``threshold``. Returns per-cell (n_vectors, n_dropped,
    n_kept).

    The clustering is what bounds the quadratic: pairwise cosine runs
    per cell, never across the corpus. At 100 TB you grow
    ``n_centroids`` with the corpus (a trained codebook —
    train_ivf_centroids — instead of the first-N stand-in) so cell
    populations stay roughly constant and the per-cell pair work stays
    flat; assignment remains a single map-side pass either way. The
    keep-lowest-id rule makes the survivor set deterministic and
    engine-portable (DuckDB oracle mirrors cell assignment and the
    rounded-cosine test operand-for-operand).
    """
    emb = _as_double(embeddings, vec_col)
    cents = {
        r[0]: [float(x) for x in r[1]]
        for r in emb.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .collect()
    }
    cdots = {cid: sum(x * x for x in v) for cid, v in cents.items()}
    v = F.col(vec_col)
    dist_structs = F.array(
        *[
            F.struct(
                _fround(_dist2_to_lit(v, cents[cid], cdots[cid]), 6).alias(
                    "d"
                ),
                F.lit(cid).alias("cid"),
            )
            for cid in sorted(cents)
        ]
    )
    unit = F.transform(v, lambda x: x / F.sqrt(_dot(v, v)))
    # rebalance before the per-row n_centroids-distance projection (a
    # single-file local input scans as one partition and would run the
    # whole assignment pass on one core)
    spread = emb.repartition(
        emb.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    assigned = spread.select(
        F.col(id_col),
        unit.alias("nv"),
        F.array_min(dist_structs).getField("cid").cast("int").alias("cell"),
    )
    totals = assigned.groupBy("cell").agg(
        F.count("*").alias("n_vectors")
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    dropped = (
        a.join(
            b,
            on=[
                F.col("a.cell") == F.col("b.cell"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .filter(
            _fround(_dot(F.col("a.nv"), F.col("b.nv")), 6)
            >= F.lit(threshold)
        )
        .select(F.col("b.cell").alias("cell"), F.col(f"b.{id_col}"))
        .distinct()
        .groupBy("cell")
        .agg(F.count("*").alias("n_dropped"))
    )
    return totals.join(dropped, "cell", "left").select(
        "cell",
        F.col("n_vectors").cast("bigint").alias("n_vectors"),
        F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
        (F.col("n_vectors") - F.coalesce("n_dropped", F.lit(0)))
        .cast("bigint")
        .alias("n_kept"),
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b,
    cos >= threshold): the high-recall verified composition — sign-LSH
    candidate generation over the union of ``tables`` hash tables,
    then exact cosine on candidate pairs only.

    This used to be an unbounded ``vec_a < vec_b`` self-join (O(n²)
    pairs, a guaranteed scale-killer); every pair now has to share a
    (table, bucket) first, the same LSH→exact-verify shape as text
    ``near_dup_verified``. With 4 tables of 4 planes, a true near-dup
    pair at cos≥0.95 collides in at least one table with p≈0.986
    (miss = (1-(1-θ/π)^planes)^tables); doubling tables squares the
    miss rate, so recall is tunable without touching the verify stage.
    The DuckDB oracle is *generated* from the same hyperplane constants
    (oracles._near_dup_lsh_sql), so the key stays fully value-checked.
    """
    return embedding_near_dup_lsh(
        embeddings,
        threshold=threshold,
        planes=planes,
        tables=tables,
        id_col=id_col,
        vec_col=vec_col,
    )


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    planes: int = 4,
    tables: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs, LSH-bucketed — the 100 TB path.

    Exact cosine is computed ONLY for pairs sharing a random-hyperplane
    bucket in at least one hash table, cutting the quadratic stage by
    ~2^planes/tables at a recall cost (sign-LSH collision probability
    is 1 - theta/pi per plane, so high-cosine pairs are very likely to
    collide in some table). Candidates dedup on the pair key; cosine on
    pre-normalized vectors (one fold per pair).
    """
    # Rebalance before the heavy per-row projection (tables x planes
    # array folds): a narrow upstream would serialize it on few tasks.
    emb = _as_double(embeddings, vec_col)
    emb = emb.repartition(
        emb.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    v = F.col(vec_col)
    unit = F.transform(v, lambda x: x / F.sqrt(_dot(v, v)))
    bucketed = None
    for t in range(tables):
        b = emb.select(
            F.col(id_col),
            unit.alias("nv"),
            F.lit(t).alias("tbl"),
            lsh_bucket(v, t, planes, dim).alias("bucket"),
        )
        bucketed = b if bucketed is None else bucketed.unionByName(b)
    a = bucketed.alias("a")
    # No join hint: (tbl, bucket) has only tables x 2^planes distinct
    # values, so forcing a shuffle join would concentrate the pair work
    # on that many tasks. Locally Catalyst broadcasts the (rebalanced)
    # bucketed side; at corpus scale raise ``planes`` so bucket
    # cardinality grows with the data and AQE's sort-merge distributes.
    b = bucketed.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.tbl") == F.col("b.tbl"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.col("a.nv").alias("na"),
            F.col("b.nv").alias("nb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cand.select(
            "vec_a",
            "vec_b",
            _fround(_dot(F.col("na"), F.col("nb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            "vec_a", "vec_b", _fround(F.col("cos_sim"), 4).alias("cos_sim")
        )
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, list[float]]:
    """Distributed Lloyd's k-means for the IVF codebook (the trained
    replacement for ann_topk_ivf's first-N stand-in).

    Each iteration is one distributed pass: assign every vector to its
    nearest centroid map-side (centroids are plan literals — no join,
    no shuffle for assignment), then recompute means with ONE groupBy
    over (cell) using element-wise array aggregation
    (``posexplode``-free: aggregate(array_agg) would collect per group,
    so instead sum each dimension with zip_with folds over a running
    array — the per-group state is one dim-length array, not the
    member vectors).

    Driver holds only the codebook (n_centroids x dim floats — it IS
    the model); corpus never leaves executors. Deterministic: init =
    first n_centroids vectors by id, ties in assignment break to the
    lower cell id (array_min on (dist, cid) structs).

    Iterative algorithms are inherently multi-job (one per iteration);
    this is the documented exception to "everything is one Catalyst
    plan" — each pass IS one plan, reusing the cached input.
    """
    emb = _as_double(embeddings, vec_col).select(id_col, vec_col)
    emb.cache()
    try:
        cents = {
            int(r[0]): [float(x) for x in r[1]]
            for r in emb.filter(F.col(id_col) < n_centroids).collect()
        }
        # remap arbitrary init ids to dense cell ids 0..n-1
        cents = {i: v for i, (_, v) in enumerate(sorted(cents.items()))}
        for _ in range(iterations):
            cdots = {cid: sum(x * x for x in v) for cid, v in cents.items()}
            dist_structs = F.array(
                *[
                    F.struct(
                        _fround(
                            _dist2_to_lit(
                                F.col(vec_col), cents[cid], cdots[cid]
                            ),
                            9,
                        ).alias("d"),
                        F.lit(cid).alias("cid"),
                    )
                    for cid in sorted(cents)
                ]
            )
            assigned = emb.select(
                F.array_min(dist_structs).getField("cid").alias("cell"),
                F.col(vec_col).alias("v"),
            )
            dim = len(next(iter(cents.values())))
            new_rows = (
                assigned.groupBy("cell")
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(F.element_at(F.col("v"), d + 1)).alias(f"s{d}")
                        for d in range(dim)
                    ],
                )
                .collect()
            )
            for r in new_rows:
                cents[int(r["cell"])] = [
                    float(r[f"s{d}"]) / int(r["n"]) for d in range(dim)
                ]
        return cents
    finally:
        emb.unpersist()


def quantization_error(
    embeddings: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "embedding",
) -> float:
    """Mean squared distance of every vector to its nearest centroid —
    the k-means objective, one distributed pass."""
    emb = _as_double(embeddings, vec_col)
    cdots = {cid: sum(x * x for x in v) for cid, v in centroids.items()}
    dist_structs = F.array(
        *[
            F.struct(
                _dist2_to_lit(F.col(vec_col), centroids[cid], cdots[cid]).alias(
                    "d"
                ),
                F.lit(cid).alias("cid"),
            )
            for cid in sorted(centroids)
        ]
    )
    row = emb.select(
        F.avg(F.array_min(dist_structs).getField("d")).alias("mse")
    ).collect()[0]
    return float(row["mse"])
