"""Skyline (Pareto frontier) operator, bucket-pruned for scale.

"Cheapest part that is also large" has no single answer — the answer
is the Pareto frontier: every (price, size) pair not dominated by
another pair that is <= on price AND >= on size with at least one
strict inequality. Classic OLAP operator (Borzsony et al., ICDE'01);
neither Spark nor the reference ships one, and the reference's
catalog-shaped data (`app.py`'s order/package attributes) is exactly
where a buyer-side "best tradeoff" query lands.

2-D skylines admit a one-pass algorithm over data sorted by
(price asc, size desc): a pair survives iff its size strictly exceeds
the best size seen so far. A direct window over that global order is
a single-task scan at scale, so this runs it bucket-parallel:

1. dedup to distinct (group, price, size) pairs — the frontier is a
   property of the pair set, and dedup collapses the relation by
   orders of magnitude before any window;
2. range-bucket pairs by price (``width_bucket`` over each group's
   min/max); every pair in a lower bucket has STRICTLY smaller price
   than every pair in a higher one, so cross-bucket dominance depends
   only on the per-bucket MAX size;
3. within-bucket skyline via the one-pass window, partitioned by
   (group, bucket) — parallelism is |groups| x |buckets|;
4. cross-bucket prune: drop survivors whose size <= the running max
   size over the group's lower buckets — computed on the
   |groups| x |buckets|-row summary and broadcast back.

The only full-relation operations are the dedup aggregate and one
bucket-partitioned window; no self-join, no all-pairs dominance test
(that is the oracle's job — NOT EXISTS over the pair set).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pareto_frontier_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    by: list[str] | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-group distinct (minimize, maximize) pairs on the Pareto
    frontier, with ``n_rows`` = how many input rows carry that pair.

    Output columns: ``by + [minimize, maximize, n_rows]``; values are
    raw (caller rounds for display). Deterministic: dominance is a
    pure predicate, bucket ids derive from each group's exact min/max.
    """
    by = list(by or [])
    pairs = df.groupBy(*by, minimize, maximize).agg(
        F.count("*").alias("n_rows")
    )
    if by:
        bounds = pairs.groupBy(*by).agg(
            F.min(minimize).alias("_lo"), F.max(minimize).alias("_hi")
        )
        pairs = pairs.join(F.broadcast(bounds), by)
    else:
        bounds = pairs.agg(
            F.min(minimize).alias("_lo"), F.max(minimize).alias("_hi")
        )
        pairs = pairs.join(F.broadcast(bounds))
    pairs = pairs.withColumn(
        "_bk",
        F.when(F.col("_lo") == F.col("_hi"), F.lit(1)).otherwise(
            F.width_bucket(
                F.col(minimize), F.col("_lo"), F.col("_hi"), F.lit(n_buckets)
            )
        ),
    )

    w_in = (
        Window.partitionBy(*by, "_bk")
        .orderBy(F.col(minimize).asc(), F.col(maximize).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = pairs.withColumn("_best", F.max(maximize).over(w_in)).filter(
        F.col("_best").isNull() | (F.col(maximize) > F.col("_best"))
    )

    w_prev = (
        Window.partitionBy(*by)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_max = (
        pairs.groupBy(*by, "_bk")
        .agg(F.max(maximize).alias("_bmax"))
        .withColumn("_prevmax", F.max("_bmax").over(w_prev))
        .select(*by, "_bk", "_prevmax")
    )
    return (
        local.join(F.broadcast(bucket_max), by + ["_bk"])
        .filter(
            F.col("_prevmax").isNull()
            | (F.col(maximize) > F.col("_prevmax"))
        )
        .select(*by, minimize, maximize, "n_rows")
    )
