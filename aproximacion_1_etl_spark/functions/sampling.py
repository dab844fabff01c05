"""Deterministic sampling / dataset splitting (training-data pipeline).

``df.sample`` is seed-dependent on partitioning and not reproducible
across engines, so large-scale pipelines sample by KEY HASH instead:
a row is in the p% sample iff a fixed-width prefix of md5(key) falls
below a threshold. Properties that matter at 100 TB:

- **Narrow**: pure per-row filter — no shuffle, no state; composes with
  partition pruning and column pruning on the scan.
- **Stable**: the same key lands in the same sample/split on every run,
  every engine, any partitioning — which is what makes train/test
  splits leak-proof across pipeline re-runs.
- **Portable**: lowercase-hex md5 prefixes compare lexicographically
  the same everywhere (fixed width), so the DuckDB oracle mirrors the
  expression verbatim; no int conversion needed.

The reference has no sampling surface (its corpus is ~1 M rows); this
is part of the north-star LLM-pipeline extension alongside
text/dedup.py (same md5-prefix trick as minhash signatures,
`text/dedup.py::minhash_signatures`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 hex chars = 16 bits of the md5 → rate granularity 1/65536, plenty
# for sampling rates and split fractions.
_WIDTH = 4
_SPACE = 16**_WIDTH

# Default ceiling on the size-derived sample rate: never keep more
# than half the corpus even when target_rows exceeds it. Oracles
# mirror the threshold arithmetic and MUST import this (and _SPACE)
# instead of re-typing the literals, so an engine-side change cannot
# silently desync the mirror.
DEFAULT_MAX_RATE = 0.5


def _hash_prefix(key: Column) -> Column:
    """First 4 hex chars of md5 of the key rendered as a string."""
    return F.substring(F.md5(key.cast("string")), 1, _WIDTH)


def rate_threshold(rate: float) -> str:
    """Hex threshold h such that P[prefix < h] == round(rate * 65536) /
    65536 for a uniform hash. rate 1.0 returns 'g', which sorts after
    every hex prefix (a 5-char '10000' would NOT: 'f...' > '10000'
    lexicographically)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    v = round(rate * _SPACE)
    if v >= _SPACE:
        return "g"
    return format(v, f"0{_WIDTH}x")


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by key hash (stable across runs,
    engines, and partitionings)."""
    return df.filter(_hash_prefix(F.col(key_col)) < F.lit(rate_threshold(rate)))


def size_derived_threshold(
    count: int, target_rows: int, max_rate: float = DEFAULT_MAX_RATE
) -> str:
    """Python twin of ``deterministic_sample_to_size``'s in-engine hex
    threshold: the quantized rate min(max_rate, target_rows/count),
    floored to 1/65536 granularity via exact integer division (never a
    float intermediate), with a floor of 1/65536 so a huge corpus still
    yields a non-empty sample. Used by tests to pin the engine
    expression's value."""
    if count <= 0:
        raise ValueError(f"count must be positive, got {count}")
    cap = int(max_rate * _SPACE)
    v = max(1, min(cap, (target_rows * _SPACE) // count))
    if v >= _SPACE:
        # rate 1.0: 'g' sorts after every hex prefix — a 5-char
        # '10000' would NOT ('f...' > '10000' lexicographically),
        # the same guard as rate_threshold
        return "g"
    return format(v, f"0{_WIDTH}x")


def deterministic_sample_to_size(
    df: DataFrame, key_col: str, target_rows: int, max_rate: float = DEFAULT_MAX_RATE
) -> DataFrame:
    """Keep ~``target_rows`` rows chosen by key hash, whatever the
    corpus size: the sampling RATE is derived in-engine as
    min(``max_rate``, target_rows / count) and quantized to an md5-
    prefix threshold — so a quadratic consumer (e.g. a pair-similarity
    histogram) built on the sample costs O(target_rows²) at ANY corpus
    scale, instead of growing with the corpus the way a fixed rate
    does (rate q keeps pair volume at q²·n², still quadratic in n).

    Stays lazy and distributed: the count is a one-column aggregate
    whose 1-row result is broadcast back (no driver collect, no eager
    job), and the sample filter itself is the same narrow per-row
    md5-prefix comparison as ``deterministic_sample``. The threshold is
    exact integer arithmetic — max(1, min(floor(max_rate·65536),
    (target_rows·65536) div count)) rendered as 4 lowercase hex chars —
    so an oracle on another engine mirrors it verbatim from its own
    count."""
    cap = int(max_rate * _SPACE)
    v = F.greatest(
        F.lit(1),
        F.least(
            F.lit(cap),
            F.expr(f"({target_rows} * {_SPACE}) div _c"),
        ),
    ).cast("int")
    # rate 1.0 ('g' guard): a 5-char '10000' would sort BEFORE 'f...'
    # and silently keep ~6% instead of 100% — same rule as
    # rate_threshold / size_derived_threshold
    thr = df.agg(F.count("*").alias("_c")).select(
        F.when(v >= _SPACE, F.lit("g"))
        .otherwise(F.format_string(f"%0{_WIDTH}x", v))
        .alias("_thr")
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .filter(_hash_prefix(F.col(key_col)) < F.col("_thr"))
        .drop("_thr")
    )


def split_column(
    key: Column, fractions: dict[str, float], name: str = "split"
) -> Column:
    """Label each row with a split name by hash range. ``fractions``
    maps split name -> fraction; fractions must sum to 1 (the last
    split absorbs rounding). Ranges are cumulative in insertion order,
    so ('train', .8), ('val', .1), ('test', .1) gives
    [0, .8) / [.8, .9) / [.9, 1]."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    prefix = _hash_prefix(key)
    expr = None
    cum = 0.0
    names = list(fractions)
    for split_name in names[:-1]:
        cum += fractions[split_name]
        branch = prefix < F.lit(rate_threshold(cum))
        expr = (
            F.when(branch, F.lit(split_name))
            if expr is None
            else expr.when(branch, F.lit(split_name))
        )
    last = F.lit(names[-1])
    return (last if expr is None else expr.otherwise(last)).alias(name)


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirtes A-ES): each row gets score = u^(1/w) with u a
    hash-derived uniform in (0,1], and the k highest scores win — rows
    with larger ``weight_col`` are proportionally more likely to be
    kept. The standard tool for importance-weighted data mixing in
    training pipelines (upweight long/high-quality documents without a
    multi-pass resample).

    Scale shape: the score is a narrow per-row expression; selection is
    one top-k (per stratum when ``strata_col`` is given) — a single
    shuffle on the stratum key with map-side partial top-k via
    window + filter under AQE. Determinism: u comes from the same
    md5-prefix trick as ``deterministic_sample`` so every engine and
    every run picks the identical sample.
    """
    return _topk_by_score(
        _aes_scored(df, key_col, weight_col), key_col, k, strata_col
    )


def _aes_scored(df: DataFrame, key_col: str, weight_col: str) -> DataFrame:
    """The A-ES score column: u^(1/w), u a hash-derived uniform in
    (0,1] — a PURE deterministic function of the row's key and weight,
    which is exactly what makes the sample maintainable (a stored
    row's score never changes, so a fold only scores the batch)."""
    u = (F.conv(_hash_prefix(F.col(key_col)), 16, 10).cast("double") + 1) / (
        _SPACE + 1
    )
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    return df.withColumn("sample_score", F.pow(u, 1.0 / w))


def _topk_by_score(
    scored: DataFrame, key_col: str, k: int, strata_col: str | None
) -> DataFrame:
    from pyspark.sql import Window

    parts = [strata_col] if strata_col else []
    win = Window.partitionBy(*parts).orderBy(
        F.col("sample_score").desc(), F.col(key_col).asc()
    )
    return (
        scored.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
        .drop("sample_rank")
    )


def fold_weighted_sample(
    store: DataFrame,
    new_rows: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_col: str | None = None,
    guard_redelivery: bool = True,
) -> DataFrame:
    """Fold a batch into a MAINTAINED A-ES sample — the sampling
    member of the maintained-state family: because each row's score is
    a pure deterministic function of its key and weight
    (``_aes_scored``), top-k(store ∪ scored(batch)) equals the
    one-shot top-k over the full corpus — a maintained sample survives
    daily appends without re-scoring history. ``store`` is the
    persisted prior sample (``weighted_sample_topk`` output: original
    columns + sample_score); per-batch cost is O(|batch| + strata·k) —
    the union the window sees is never corpus-sized. The catalog key's
    oracle is the one-shot sample over the full corpus (fold ==
    rebuild, the family's standard proof).

    RE-DELIVERY GUARD (``guard_redelivery``, default on — the r11
    audit of every maintained fold): a re-delivered batch row whose
    key already sits in the stored sample would enter the union TWICE
    with the identical score (scores are pure functions of key +
    weight), and row_number would keep BOTH copies inside the top-k —
    a duplicated member silently evicting a legitimate k-th one. The
    store is strata·k-sized, so dropping batch keys already stored is
    one broadcast anti-join. Keys are immutable by the append-only
    contract (a changed weight would change the score and is not a
    re-delivery), so the guard never drops a legitimate update. The
    guard also dedups WITHIN the batch (ADVICE r11 #3): two
    deliveries compacted into ONE trigger — the same key twice in one
    micro-batch — would pass a store-only anti-join and enter the
    union twice with identical scores, so the batch is
    ``dropDuplicates(key)``-ed first (batch-bounded)."""
    if guard_redelivery:
        new_rows = new_rows.dropDuplicates([key_col]).join(
            F.broadcast(store.select(key_col).distinct()),
            key_col,
            "left_anti",
        )
    return _topk_by_score(
        store.unionByName(_aes_scored(new_rows, key_col, weight_col)),
        key_col,
        k,
        strata_col,
    )


def forget_weighted_sample(
    store: DataFrame,
    deleted_keys: DataFrame,
    key_col: str,
    k: int,
    reserve: int,
    strata_col: str | None = None,
) -> DataFrame:
    """DELETE subjects from a MAINTAINED A-ES sample — the RTBF edge
    of the sampling member (r13, VERDICT r12 task 1: the one
    maintained store without one, and the most literally
    RTBF-relevant state the engine persists, since a sample store
    holds RAW member rows). ``store`` is the persisted top-(k +
    ``reserve``) per stratum (``weighted_sample_topk`` with
    k+reserve): the OVER-SAMPLE RESERVE is what makes deletion exact
    without a corpus rescan. Because A-ES scores are pure functions
    of (key, weight), the store's rows are exactly the
    (k+reserve) highest-scoring rows of the corpus — so after
    evicting a delete wave, the survivors are exactly the highest-
    scoring rows of the POST-DELETE corpus, and the visible top-k
    read off them equals a from-scratch sample over the post-delete
    corpus (forget == rebuild, the family's standard proof) as long
    as no stratum lost more than ``reserve`` stored rows.

    Scale shape: one broadcast left join marks the wave against the
    strata·(k+reserve)-sized store, and the per-stratum exhaustion
    stats aggregate over that same marked relation (the graph-forget
    mark-and-split device — guard and survivors derive from ONE
    relation so they can never disagree). Nothing rescans the corpus.

    LOUD on reserve exhaustion (the forget_lm_counts raise device): a
    stratum that stored the FULL k+reserve rows (so the corpus may
    extend beyond the store) and lost so many that fewer than k
    survive cannot be backfilled from the store — the next-best
    corpus rows were never retained. That stratum's sample must be
    REBUILT from the surviving corpus (the documented floor, the
    sketch_forget_rebuild precedent); proceeding silently would
    publish a sample that under-fills k or, worse, mismatches the
    rebuild. A stratum stored SHORT of k+reserve holds its ENTIRE
    corpus stratum, so eviction there is complete truth and never
    raises, however many rows it loses. Deleting keys absent from
    the store removes nothing — a re-delivered RTBF wave is a no-op.

    Returns the SHRUNK STORE (reserve depleted by the evictions;
    production tops it back up at the next rebuild window). The
    visible sample is the top-k read: ``_topk_by_score(shrunk,
    key_col, k, strata_col)``."""
    parts = [strata_col] if strata_col else []
    cap = k + reserve
    del_keys = deleted_keys.select(key_col).distinct()
    marked = store.join(
        F.broadcast(del_keys.withColumn("_d", F.lit(True))),
        key_col,
        "left",
    ).localCheckpoint(eager=False)
    n_before = F.count("*")
    n_evicted = F.coalesce(
        F.sum(F.when(F.col("_d"), 1).otherwise(0)), F.lit(0)
    )
    exhausted = (n_before == cap) & ((n_before - n_evicted) < k)
    guard = (
        F.when(
            exhausted,
            F.raise_error(
                F.concat(
                    F.lit(
                        "forget_weighted_sample reserve exhausted: a "
                        "stratum lost more than the reserve "
                        f"({reserve}) stored rows and can no longer "
                        "back-fill the top-"
                    ),
                    F.lit(str(k)),
                    F.lit(
                        " sample from the store — rebuild that "
                        "stratum's sample from the surviving corpus"
                    ),
                )
            ),
        )
        .otherwise(F.lit(True))
        .alias("_ok")
    )
    stats = marked.groupBy(*parts).agg(guard)
    survivors = marked.filter(F.col("_d").isNull()).drop("_d")
    if parts:
        out = survivors.join(F.broadcast(stats), parts)
    else:
        out = survivors.crossJoin(F.broadcast(stats))
    # the guard must survive column pruning: a bare .drop would let
    # Catalyst prune _ok and with it the raise_error expression — the
    # filter forces the when() to evaluate per stratum (it is always
    # True when it does not raise)
    return out.filter(F.col("_ok")).drop("_ok")


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` equivalent,
    reproducible): stratum s keeps ~rates[s] of its rows; strata absent
    from ``rates`` are dropped. Still a narrow per-row filter — the
    stratum column is just data, no shuffle."""
    prefix = _hash_prefix(F.col(key_col))
    cond = None
    for stratum, rate in rates.items():
        branch = (F.col(strata_col) == stratum) & (
            prefix < F.lit(rate_threshold(rate))
        )
        cond = branch if cond is None else cond | branch
    return df.filter(cond if cond is not None else F.lit(False))


def deterministic_global_index(
    df: DataFrame,
    key_col: str,
    bucket_chars: int = 2,
    name: str = "global_idx",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic 0-based global row index in hash order — the
    "shuffled corpus" every training run needs, WITHOUT the single-task
    global window a naive ``row_number() OVER (ORDER BY ...)`` compiles
    to. Two-phase distributed ranking:

    1. bucket every row by an md5 prefix (16^``bucket_chars`` buckets)
       and rank WITHIN each bucket — one shuffle, fully parallel;
    2. compute per-bucket row counts (a bucket-count relation bounded
       by the bucket space, e.g. 256 rows), turn them into cumulative
       offsets with a window over that tiny relation, and broadcast
       the offsets back.

    global index = bucket offset + within-bucket rank − 1. Because the
    bucket is a PREFIX of the full hash, (bucket, hash, key) ordering
    equals (hash, key) ordering, so the result is identical to the
    global sort — at any scale, with the global coordination confined
    to a 256-row window. Deterministic: md5 of the key, ties broken by
    key; stable across runs, engines, and partitionings.

    With ``partition_cols`` the index restarts at 0 WITHIN each
    partition-column group (e.g. one independent shuffled order per
    length bucket): ranking windows and offsets are keyed by
    (group, hash-bucket), so the offsets relation stays
    |groups| x 16^bucket_chars rows — still broadcast-scale — and no
    group ever ranks in a single task. Partition columns must be
    NON-NULL: the offsets equi-join drops null group keys (coalesce a
    sentinel in first if the group can be null).
    """
    from pyspark.sql import Window

    pcols = list(partition_cols or [])
    h = F.md5(F.col(key_col).cast("string"))
    tagged = df.withColumn("_h", h).withColumn(
        "_bucket", F.substring(F.col("_h"), 1, bucket_chars)
    )
    counts = tagged.groupBy(*pcols, "_bucket").agg(F.count("*").alias("_n"))
    wo = (
        Window.partitionBy(*pcols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *pcols,
        "_bucket",
        F.coalesce(F.sum("_n").over(wo), F.lit(0)).alias("_off"),
    )
    wb = Window.partitionBy(*pcols, "_bucket").orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    return (
        tagged.join(F.broadcast(offsets), [*pcols, "_bucket"])
        .withColumn(
            name,
            (F.row_number().over(wb) - 1 + F.col("_off")).cast("bigint"),
        )
        .drop("_h", "_bucket", "_off")
    )


def pack_training_batches(
    df: DataFrame,
    key_col: str,
    batch_size: int,
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic training-batch assignment: hash-shuffle the corpus
    (``deterministic_global_index``) and cut it into fixed-size batches
    — (batch_id, position) per row, every batch full except the last.
    Reproducible data ordering is what makes training runs comparable;
    doing it with a scalable global index instead of a driver-side
    shuffle is what makes it work at corpus scale."""
    idx = deterministic_global_index(
        df, key_col, bucket_chars=bucket_chars
    )
    return idx.select(
        *df.columns,
        "global_idx",
        F.expr(f"global_idx div {batch_size}")
        .cast("bigint")
        .alias("batch_id"),
        (F.col("global_idx") % batch_size).cast("bigint").alias("position"),
    )


def length_bucketed_batches(
    df: DataFrame,
    key_col: str,
    size_col: str,
    batch_size: int,
    bucket_width: int = 64,
) -> DataFrame:
    """Length-bucketed training batches: group rows whose ``size_col``
    (token count) falls in the same ``bucket_width``-wide band, then
    cut each band into deterministic hash-ordered batches. Batching
    similar-length sequences together is the standard padding-waste
    reduction (a batch's cost is max-length x batch_size; mixing a
    4k-token doc with 30 short ones pays 4k for all 31) — this wires
    it to the same two-phase distributed index as
    ``pack_training_batches``, partitioned per band, so no band ever
    ranks in a single task.

    Output: input columns + (len_bucket, batch_id, position); batch_id
    restarts per band — every batch is homogeneous in band.
    """
    banded = df.withColumn(
        "len_bucket",
        F.expr(f"CAST({size_col} AS BIGINT) div {bucket_width}").cast(
            "bigint"
        ),
    )
    idx = deterministic_global_index(
        banded, key_col, partition_cols=["len_bucket"], name="_idx"
    )
    return idx.select(
        *df.columns,
        "len_bucket",
        F.expr(f"_idx div {batch_size}").cast("bigint").alias("batch_id"),
        (F.col("_idx") % batch_size).cast("bigint").alias("position"),
    )
