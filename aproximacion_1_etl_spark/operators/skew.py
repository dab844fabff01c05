"""Skew-mitigation operators: salted aggregation and replicated joins.

The reference never handles skew (its BigQuery SPs delegate it to BQ's
engine; `Composer/DAG_cloudrun_dataflow_sp.py:114-278`), but at 100 TB
a handful of hot keys — one mega-customer, one dominant event_type —
turns a single shuffle partition into the job's critical path. Two
standard mitigations, expressed declaratively so Catalyst still prunes
and pushes down around them:

- **salted aggregation** (two-phase): pre-aggregate on
  (key, salt) so the hot key's rows are combined by up to ``buckets``
  tasks in parallel, then combine the partials on the key alone. The
  second shuffle moves only ``|keys| x buckets`` pre-aggregated rows.
  This is map-side combine made explicit and wider: Spark's partial
  aggregation already combines within a task, but a hot key spread
  over thousands of tasks still funnels into ONE reducer; salting
  inserts a combining layer of ``buckets`` reducers in between.
- **replicated (broadcast-free) skew join**: when the dim side is too
  big to broadcast but the fact side has hot keys, explode the dim
  ``buckets`` times and salt the fact side, so one hot key's fact rows
  spread over ``buckets`` co-partitioned reducers instead of one.

Both produce results identical to the unsalted equivalent (the DuckDB
oracle for each runs the PLAIN group-by/join), which is the point:
salting is a physical rewrite, not a semantic one. AQE's
``skewJoin`` handles the join case automatically when statistics catch
it; the explicit form is for when you know the hot keys a priori (the
reference's ``delivery_order_id`` would be one) or the skew is in an
aggregation, which AQE does not rebalance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    salt_on: str,
    metrics: dict[str, F.Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``metrics`` maps output name -> expression to SUM per group; each is
    cast to DECIMAL(30,8) before summing so partial/final composition is
    exact and partition-order-independent. A row count ``n_<first key>``
    is not implied — pass ``F.lit(1)`` to count. ``salt_on`` must be a
    column with high cardinality within each key group (a row id).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets)).alias("_salt")
    partial = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[
            F.sum(expr.cast("decimal(30,8)")).alias(f"_p_{name}")
            for name, expr in metrics.items()
        ]
    )
    return partial.groupBy(*[F.col(k) for k in keys]).agg(
        *[
            F.sum(F.col(f"_p_{name}")).alias(name)
            for name in metrics
        ]
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated ``buckets`` times and the
    fact side salted, spreading each hot fact key over ``buckets``
    reducers. Row-identical to ``fact.join(dim, fact[fact_key] ==
    dim[dim_key], how)``; cost trades a ``buckets``x dim shuffle volume
    for even fact distribution. Inner/left only (replication would
    multiply unmatched dim rows under right/full).
    """
    if how not in ("inner", "left"):
        raise ValueError("replicated_skew_join supports inner/left only")
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets))
    )
    replicated_dim = dim.withColumn(
        "_rep", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_rep", F.col("_rep").cast("long"))
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["_salt"] == replicated_dim["_rep"]),
        how,
    )
    return joined.drop("_salt", "_rep")
