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
