"""Temporal joins (SURVEY.md §2.5 extension).

The reference's joins are all key-equi (child-aggregate -> parent,
``Composer/DAG_cloudrun_dataflow_sp.py:114-278``); these are the two
temporal shapes its event tables invite but BigQuery SPs never wrote:

- **as-of join** — "latest event at or before each order's date".
  Implemented as union + one key-partitioned window (the scalable
  form): both sides shuffle ONCE on the key, events and probes are
  interleaved in time order, and ``last_value(ignoreNulls)`` carries
  the most recent event forward onto each probe row. No range-join
  explosion, no per-key ``collect`` — at 100 TB this is a single
  shuffle + sort, and AQE handles key skew.
- **range join** — "events within [start, start+N days) per key".
  Equi-key join with a range predicate; Spark executes it as a
  shuffled hash/sort-merge join on the key with the range as a
  post-join filter, so cost is bounded by key co-partitioning (not a
  cartesian). Pre-bucketing both sides on the key removes the
  shuffle entirely on a real cluster.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the ``value_cols`` of the ``right``
    row with the greatest ``right_ts`` <= ``left_ts`` for the same key
    (``direction="backward"``, the default) or the smallest
    ``right_ts`` >= ``left_ts`` (``direction="forward"``); ties at
    equal ``right_ts`` break by the greatest ``tiebreak`` either way.
    With ``tolerance_seconds``, a match farther than the tolerance from
    the left timestamp is NULLed out (pandas ``merge_asof`` parity) —
    applied AFTER the merge, so it costs a projection, not a join.
    Left rows with no qualifying right row get NULLs.

    Returns all ``left`` columns plus ``asof_<col>`` for each value col
    and ``asof_ts``. Plan shape is direction-independent: one union,
    one shuffle on the key, one ordered window — never a range join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts before left at equal ts (<=)
        F.col(tiebreak).alias("_tb"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.lit(None).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    u = r.unionByName(l)
    ts_order = (
        F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_side",
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.last(
            F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True
        ).over(w).alias("asof_ts"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        # compare in exact integer MICROSECONDS (merge_asof parity):
        # unix_timestamp truncates to whole seconds (a 2.9 s gap would
        # pass a 2 s tolerance), and double epoch seconds carry ~5e-7 s
        # representation error at modern epochs — enough to flip a
        # match sitting exactly on the tolerance boundary
        ok = (
            F.col("asof_ts").isNotNull()
            & (
                F.abs(
                    F.unix_micros(F.col(left_ts).cast("timestamp"))
                    - F.unix_micros(F.col("asof_ts"))
                )
                <= F.lit(int(round(float(tolerance_seconds) * 1_000_000)))
            )
        )
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(ok, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
            F.when(ok, F.col("asof_ts")).alias("asof_ts"),
        )
    return out


def range_join_rollup(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    days: int,
    aggs: dict[str, F.Column],
) -> DataFrame:
    """Aggregate ``right`` rows falling in [left_ts, left_ts + days) per
    left row (key-equi + time-range join, then group back to the left
    grain). Left rows with no matches are kept (left join)."""
    lk = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_start"),
        *left.columns,
    )
    rk = right.select(
        F.col(right_key).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        *[c for c in right.columns if c not in (right_key, right_ts)],
    )
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (F.col("_rts") >= F.col("_start"))
        & (F.col("_rts") < F.col("_start") + F.expr(f"INTERVAL {days} DAYS"))
    )
    joined = lk.join(rk, cond, "left")
    return joined.groupBy(*[F.col(c) for c in left.columns]).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )


def build_bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> list[int]:
    """Distributed Bloom-filter build over a key relation: k xxhash64
    probes per key, bit positions OR-folded into 64-bit words with ONE
    groupBy(word_index) aggregation — the driver receives only the
    m_bits/64-long bitmap (8 KB at the default m), never the keys.

    m_bits must be a power of two (positions use a bitmask, keeping
    the modulo exact for negative hash values). Deterministic:
    xxhash64 is a fixed function of (value, seed), so the same key set
    always yields the same bitmap."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    (
                        F.xxhash64(F.col(key_col), F.lit(h))
                        .bitwiseAND(F.lit(m_bits - 1))
                    ).alias(f"p{h}")
                    for h in range(k_hashes)
                ]
            )
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / F.lit(64)).cast("long").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[int(r["w"])] = int(r["word"])
    return bitmap


def bloom_prune_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    how: str = "inner",
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter-pruned join: the 100 TB shuffle-reduction shape.
    When the small side is too large to broadcast but still selective,
    a plain shuffled join moves EVERY big-side row; this builds a
    Bloom bitmap over the small side's keys (build_bloom_bitmap —
    kilobytes on the driver), bakes it into the big side's scan as a
    literal array, and drops non-matching rows MAP-SIDE before the
    shuffle. The exact join then eliminates the Bloom's false
    positives, so the result is row-identical to the plain join (the
    filter is conservative: a present key tests positive in every
    probe) — which is exactly why the operator stays fully
    value-checkable against a plain-join oracle.

    This is the explicit, plan-visible form of Spark's runtime row-
    level filtering (spark.sql.optimizer.runtime.bloomFilter.*): here
    the build is reusable across queries and the pruning is
    guaranteed, not cost-based. Shuffle carries ~|matches| +
    |big| * fpr rows instead of |big|; with m/n = 16 bits/key and k=3
    the false-positive rate is under 1%."""
    bitmap = build_bloom_bitmap(small, small_key, m_bits, k_hashes)
    words_sql = "array(" + ",".join(
        f"CAST({w} AS BIGINT)" for w in bitmap
    ) + ")"
    probes = []
    for h in range(k_hashes):
        p = f"(xxhash64({big_key}, {h}) & {m_bits - 1})"
        probes.append(
            f"((element_at({words_sql}, CAST({p} / 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT)))"
            " != 0)"
        )
    pruned = big.filter(F.expr(" AND ".join(probes)))
    return pruned.join(
        small, pruned[big_key] == small[small_key], how
    )
