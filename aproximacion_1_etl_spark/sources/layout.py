"""Multi-dimensional file clustering (Z-order) for write-time layout.

``compact_table(sort_by=...)`` (tables.py) clusters on ONE key: scans
filtered on that key skip row groups, scans filtered on any other key
read everything. Z-ordering interleaves the bits of several keys into
one sort value so each file covers a small HYPER-RECTANGLE of the key
space — selective predicates on ANY of the clustered dimensions skip
most files. This is the layout Delta/Iceberg expose as ``OPTIMIZE
ZORDER BY``; here it is pure DataFrame expressions: normalize each key
to a fixed-width integer rank, interleave bits, range-partition + sort
on the interleaved value. Nothing custom at read time — parquet min/max
row-group stats plus Spark's scan pruning do the skipping.

At 100 TB: z-order the fact table on its 2-3 highest-selectivity query
dimensions at compaction time (the write is one range-shuffle — same
cost as the single-key sort it replaces).
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zvalue(col_bounds: list[tuple[Column, float, float]], bits: int = 16) -> Column:
    """Interleaved-bit Z-value over numeric columns.

    ``col_bounds``: (column, min, max) per dimension; each value is
    linearly scaled to a ``bits``-wide integer rank, then ranks are
    bit-interleaved (dimension d contributes bit i to output bit
    ``i*n_dims + d``). Pure JVM expressions — whole-stage codegen, no
    UDF. Total output bits = bits * n_dims must stay < 63.
    """
    n = len(col_bounds)
    if bits * n >= 63:
        raise ValueError("bits * n_dims must fit a signed long")
    top = (1 << bits) - 1
    ranks = []
    for col, lo, hi in col_bounds:
        span = float(hi - lo) if hi > lo else 1.0
        scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)) * F.lit(
            float(top)
        )
        ranks.append(
            F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top))
        )
    parts = [
        F.shiftleft(
            F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + d
        )
        for d, r in enumerate(ranks)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``.

    Bounds come from one cheap min/max aggregate over the input (at
    scale: a column-pruned scan). The z-value exists only as a sort
    expression — the written schema is unchanged.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    b = df.agg(*aggs).collect()[0]
    z = zvalue(
        [
            (F.col(c), float(b[f"_lo_{c}"]), float(b[f"_hi_{c}"]))
            for c in cols
        ],
        bits=bits,
    )
    (
        df.repartitionByRange(n_files, z)
        .sortWithinPartitions(z)
        .write.mode("overwrite")
        .parquet(path)
    )
