"""Interval-overlap analytics: peak concurrency via boundary deltas.

The reference's visit/event chain reasons about per-order event
*sequences* (`Composer/DAG_cloudrun_dataflow_sp.py:210-278`); the
natural next question a capacity planner asks of the same data is
"how many of these were open AT ONCE?" — concurrent deliveries in
flight, concurrent sessions, concurrent holds. The classic algorithm
is a sweep line: +1 at each start, -1 at each end, running sum, max.

The running sum is the scale hazard: a naive
``sum() OVER (PARTITION BY key ORDER BY t)`` puts EVERY boundary of a
key into one task — a single hot key (one event_type at 100 TB is
billions of boundaries) serializes the job. This implementation is the
standard two-phase prefix sum:

1. boundaries collapse to one delta per ``(key, instant)`` (a normal
   shuffled aggregate — map-side combined, no hot task);
2. an *intra-bucket* running sum windows over ``(key, day-bucket)``
   partitions, so parallelism is ``|keys| x |days|``;
3. a *cross-bucket* offset comes from a window over the per-bucket
   totals — a ``|keys| x |days|``-row relation, small relative to the
   boundary relation — joined back. The joins carry NO broadcast
   hint on purpose: for low-cardinality keys (event types) AQE sees
   the tiny build side at runtime and broadcasts anyway, while a
   high-cardinality key (user_id over years of days) makes the
   offsets relation too big for the driver, and a forced hint there
   would OOM it. Letting AQE choose is the 100 TB-safe default; the
   shuffle keys of both joins match the aggregate's keys so the
   sort-merge fallback re-uses the existing partitioning.

End instants are exclusive (``[start, end)``): an interval ending at
``t`` never overlaps one starting at ``t``, which the per-instant
delta aggregation encodes for free (the +1 and -1 sum before the
running scan sees them).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def max_concurrency(
    df: DataFrame,
    key: str,
    start: Column,
    end: Column,
) -> DataFrame:
    """Peak number of concurrently-open ``[start, end)`` intervals per
    ``key``, with the first instant the peak is reached.

    Returns one row per key: ``(key, n_intervals, peak_concurrency,
    peak_at)``. Deterministic: deltas are integers, per-instant
    pre-aggregation makes the running sum independent of row order,
    and the peak instant is the MIN t among peak-achieving instants.
    """
    iv = df.select(F.col(key), start.alias("_s"), end.alias("_e"))
    bounds = iv.select(key, F.col("_s").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(key, F.col("_e").alias("t"), F.lit(-1).alias("d"))
    )
    deltas = bounds.groupBy(key, "t").agg(F.sum("d").alias("delta"))

    bucket = F.to_date("t").alias("_b")
    deltas = deltas.withColumn("_b", bucket)
    w_intra = (
        Window.partitionBy(key, "_b")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = deltas.withColumn("run_intra", F.sum("delta").over(w_intra))

    per_bucket = deltas.groupBy(key, "_b").agg(F.sum("delta").alias("bt"))
    w_off = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        key, "_b", F.coalesce(F.sum("bt").over(w_off), F.lit(0)).alias("off")
    )

    running = intra.join(offsets, [key, "_b"]).withColumn(
        "running", (F.col("off") + F.col("run_intra")).cast("bigint")
    )
    w_peak = Window.partitionBy(key)
    peaks = (
        running.withColumn("peak", F.max("running").over(w_peak))
        .filter(F.col("running") == F.col("peak"))
        .groupBy(key)
        .agg(
            F.max("peak").alias("peak_concurrency"),
            F.min("t").alias("peak_at"),
        )
    )
    counts = iv.groupBy(key).agg(F.count("*").alias("n_intervals"))
    return peaks.join(counts, key).select(
        key,
        F.col("n_intervals").cast("bigint").alias("n_intervals"),
        F.col("peak_concurrency").cast("bigint").alias("peak_concurrency"),
        F.date_format("peak_at", "yyyy-MM-dd HH:mm:ss").alias("peak_at"),
    )
