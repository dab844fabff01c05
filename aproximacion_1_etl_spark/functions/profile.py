"""Single-pass dataset profiler (data-quality surface).

The reference's only quality signal is the per-day ``fallos`` count in
its metadata sidecar (``app.py:166-171``). A 100 TB training-data
pipeline needs column-level health checks before any expensive
downstream stage: null ratios catch broken extractors, distinct counts
catch key collapses / fanout bugs.

Everything is computed in ONE aggregation pass over the table (one
job, one scan): per column count() gives non-null counts;
count(DISTINCT col) columns share the scan via Catalyst's expand
rewrite. The wide 1-row result is unpivoted to long form with
``stack`` — driver-side cost is |columns|, not |rows|.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: total rows, null count, exact distinct count.

    Returns (column_name, n_rows, n_nulls, n_distinct) — one row per
    profiled column, computed in a single aggregation over the input.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}" for c in cols
    )
    return wide.select(
        F.col("_n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, _nn, _nd)"
        ),
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_rows") - F.col("_nn")).cast("bigint").alias("n_nulls"),
        F.col("_nd").cast("bigint").alias("n_distinct"),
    )


def corpus_fingerprint(
    df: DataFrame,
    key_col: str,
    content_cols: list[str],
    levels: tuple[int, ...] = (6, 3),
) -> DataFrame:
    """Order-insensitive Merkle-style corpus digest: one row
    (n_rows, fingerprint) that changes iff any keyed row's content
    changes. This is the reproducibility primitive of a training-data
    platform — "is the corpus byte-identical to the one that trained
    run X" answered without shipping the corpus.

    Tree construction instead of one global sort: row hashes (sha256
    over key + fields, \\x01-joined) roll up through hex-prefix levels
    — group by the first ``levels[0]`` hex chars and digest each
    bucket's SORTED hashes, then regroup those digests by the next
    shorter prefix, and finally digest the root level. Every
    ``collect_list`` is bounded: the leaf group is |corpus| / 16^l0
    rows and inner groups hold at most 16^(l_i - l_{i+1}) child
    digests, so no stage ever materializes more than a few thousand
    64-char strings regardless of corpus size (the single-groupBy
    alternative collects the entire corpus's hashes into one task).
    Deterministic across engines/partitionings: hex sort order +
    sha256 are engine-portable, and sorting INSIDE each digest makes
    the result independent of arrival order.
    """
    h = F.sha2(
        F.concat_ws(
            "\x01",
            F.col(key_col).cast("string"),
            *[F.col(c).cast("string") for c in content_cols],
        ),
        256,
    )
    rows = df.select(h.alias("h"))
    cur = rows.select(
        F.substring("h", 1, levels[0]).alias("p"),
        F.col("h").alias("d"),
        F.lit(1).alias("n"),
    )
    for nxt in (*levels[1:], 0):
        agg = cur.groupBy("p").agg(
            F.sha2(
                F.concat_ws("", F.array_sort(F.collect_list("d"))), 256
            ).alias("d"),
            F.sum("n").alias("n"),
        )
        cur = agg.select(
            F.substring("p", 1, nxt).alias("p"), "d", "n"
        )
    return cur.groupBy("p").agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sha2(
            F.concat_ws("", F.array_sort(F.collect_list("d"))), 256
        ).alias("fingerprint"),
    ).drop("p")


def profile_state(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row WIDE mergeable profile state: row count plus per-column
    null count and TYPED min/max (never stringified — "10" < "9" as
    strings, so string-rendered extrema don't merge; rendering happens
    only at presentation time in ``profile_from_states``). This is the
    deequ-style partial a daily batch persists: merging two states
    (sum / sum / min / max) gives exactly the state a full rescan
    would, so a standing table's profile updates per day at
    O(batch + 1-row state), not O(history)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_null_{c}"),
            F.min(c).alias(f"_min_{c}"),
            F.max(c).alias(f"_max_{c}"),
        ]
    return df.agg(*aggs)


def distinct_state(df: DataFrame, cols: list[str]) -> DataFrame:
    """Distinct (column_name, value) pairs in ONE scan (stack, then
    distinct) — the EXACT-distinct merge state. Cardinality composes
    across batches by unioning states and re-distincting: state size
    is O(|distinct values|), never O(history rows) — the same
    state-outlives-the-batch shape as the incremental-dedup signature
    store. At 100 TB swap this relation for per-column HLL sketches
    (hll_sketch_agg / hll_union_agg): identical merge algebra,
    constant-size state, approximate answer."""
    stacked = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    return (
        df.selectExpr(
            f"stack({len(cols)}, {stacked}) AS (column_name, value)"
        )
        .where(F.col("value").isNotNull())
        .distinct()
    )


def merge_profile_states(states: list[DataFrame], cols: list[str]) -> DataFrame:
    """Fold any number of wide profile states into one: counts add,
    extrema min/max — the merge is associative and commutative, so
    daily states can fold in any order (or tree-reduce)."""
    allst = states[0]
    for s in states[1:]:
        allst = allst.unionByName(s)
    aggs = [F.sum("_n").cast("bigint").alias("_n")]
    for c in cols:
        aggs += [
            F.sum(f"_null_{c}").cast("bigint").alias(f"_null_{c}"),
            F.min(f"_min_{c}").alias(f"_min_{c}"),
            F.max(f"_max_{c}").alias(f"_max_{c}"),
        ]
    return allst.agg(*aggs)


def profile_from_states(
    moments: DataFrame, values: DataFrame, cols: list[str]
) -> DataFrame:
    """Render (column_name, n_rows, n_null, n_distinct, min_str,
    max_str) from a wide moment state plus a distinct-value state —
    the presentation step where typed extrema finally stringify."""
    stacked = ", ".join(
        f"'{c}', _null_{c}, CAST(_min_{c} AS STRING), "
        f"CAST(_max_{c} AS STRING)"
        for c in cols
    )
    long = moments.selectExpr(
        "_n",
        f"stack({len(cols)}, {stacked}) AS "
        "(column_name, n_null, min_str, max_str)",
    )
    nd = values.groupBy("column_name").agg(
        F.count("*").cast("bigint").alias("n_distinct")
    )
    return long.join(nd, "column_name", "left").select(
        "column_name",
        F.col("_n").alias("n_rows"),
        "n_null",
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        "min_str",
        "max_str",
    )


def row_bucket_hashes(
    df: DataFrame,
    key_col: str,
    content_cols: list[str],
    prefix_len: int = 6,
) -> DataFrame:
    """(prefix, h) per row: the key-prefix bucket plus the content row
    hash — the leaf relation both ``fingerprint_level`` and the
    incremental (streaming) Merkle maintenance build on. Persist this
    partitioned by ``prefix`` and a micro-batch can recompute exactly
    the buckets it touched with a partition-pruned read."""
    h = F.sha2(
        F.concat_ws(
            "\x01",
            F.col(key_col).cast("string"),
            *[F.col(c).cast("string") for c in content_cols],
        ),
        256,
    )
    kp = F.substring(F.md5(F.col(key_col).cast("string")), 1, prefix_len)
    return df.select(kp.alias("prefix"), h.alias("h"))


def fingerprint_level(
    df: DataFrame,
    key_col: str,
    content_cols: list[str],
    prefix_len: int = 6,
) -> DataFrame:
    """One level of the Merkle tree ``corpus_fingerprint`` builds:
    (prefix, digest, n_rows) per hex-prefix bucket. Exposed separately
    because bucket digests LOCALIZE change: comparing two corpora's
    level relations pinpoints which 1/16^len slice of the key space
    differs without touching matching buckets — the incremental
    integrity check (sync only changed buckets) at any corpus size.

    The bucket comes from the KEY hash (md5), not the content hash: an
    edited row must stay in its bucket so the diff reads 'changed'
    there, rather than relocating and producing an only_left/only_right
    pair in two unrelated buckets."""
    return (
        row_bucket_hashes(df, key_col, content_cols, prefix_len)
        .groupBy("prefix")
        .agg(
            F.sha2(
                F.concat_ws("", F.array_sort(F.collect_list("h"))), 256
            ).alias("digest"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
    )


def fingerprint_diff(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    content_cols: list[str],
    prefix_len: int = 6,
) -> DataFrame:
    """Which buckets differ between two corpus snapshots: full-outer
    join of the two level relations on the hash prefix, keeping only
    prefixes whose digests disagree (changed / only_left / only_right).
    Matching buckets — the overwhelming majority between adjacent
    snapshots — compare by ONE 64-char digest each, so the diff cost
    is the two level builds plus a bucket-count-sized join, never a
    row-by-row corpus comparison."""
    la = fingerprint_level(left, key_col, content_cols, prefix_len)
    rb = fingerprint_level(right, key_col, content_cols, prefix_len)
    j = la.select(
        "prefix",
        F.col("digest").alias("d_l"),
        F.col("n_rows").alias("n_left"),
    ).join(
        rb.select(
            "prefix",
            F.col("digest").alias("d_r"),
            F.col("n_rows").alias("n_right"),
        ),
        "prefix",
        "full_outer",
    )
    return (
        j.filter(
            F.col("d_l").isNull()
            | F.col("d_r").isNull()
            | (F.col("d_l") != F.col("d_r"))
        )
        .select(
            "prefix",
            F.when(F.col("d_l").isNull(), F.lit("only_right"))
            .when(F.col("d_r").isNull(), F.lit("only_left"))
            .otherwise(F.lit("changed"))
            .alias("status"),
            F.coalesce("n_left", F.lit(0)).cast("bigint").alias("n_left"),
            F.coalesce("n_right", F.lit(0)).cast("bigint").alias("n_right"),
        )
    )
