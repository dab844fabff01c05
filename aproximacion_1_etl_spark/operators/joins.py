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
) -> DataFrame:
    """For each ``left`` row, attach the ``value_cols`` of the ``right``
    row with the greatest ``right_ts`` <= ``left_ts`` for the same key
    (ties broken by the greatest ``tiebreak``). Left rows with no prior
    right row get NULLs.

    Returns all ``left`` columns plus ``asof_<col>`` for each value col
    and ``asof_ts``.
    """
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
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
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
    return carried.filter(F.col("_side") == 1).drop("_side")


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
