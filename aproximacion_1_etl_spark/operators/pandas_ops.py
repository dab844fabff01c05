"""Arrow-batched grouped Python operators (SURVEY.md §2.8).

The reference's per-element Python (Beam ``FlatMap`` bodies,
``src/2_run_events_info_temp_pipeline.py:73-110``) maps to Spark's
vectorized path: ``applyInPandas`` ships each group to Python ONCE as
an Arrow batch, runs a pandas function over the whole group, and
returns columnar results — ~10-100x over row-at-a-time UDFs and the
only sane shape at 100 TB (one shuffle on the group key, then pure
columnar compute; no per-row serialization).

Used for statistics the built-in JVM aggregates don't cover (exact
median is available as percentile(), but the point here is the grouped
custom-Python surface itself, oracle-checked against DuckDB).
"""

from __future__ import annotations

# Iterator must live in MODULE globals: with postponed annotations the
# pandas_udf signature is a string, and Spark resolves
# 'Iterator[pd.Series]' against this namespace (same reason pd is here)
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def l2_norm_udf():
    """Scalar pandas_udf (Arrow-vectorized): L2 norm of an
    array<double> column, floor-rounded to 4 decimals. Sequential
    per-element summation matches DuckDB's list_dot_product fold order,
    keeping doubles bit-stable pre-round."""
    import math

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        def norm(v) -> float:
            s = 0.0
            for x in v:
                s += float(x) * float(x)
            return math.floor(math.sqrt(s) * 10000.0 + 0.5) / 10000.0

        return vecs.map(norm)

    return l2_norm


def grouped_stats_pandas(
    df: DataFrame,
    key: str,
    value_col: str,
    scale: int = 4,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-key stats computed in grouped pandas: row count, exact
    median (linear interpolation, matching DuckDB ``median``), and
    spread (max - min). Floats floor-rounded to ``scale`` decimals for
    engine-stable hashing.

    The input is explicitly hash-repartitioned on ``key`` to
    ``parallelism`` partitions (default: the cluster's
    defaultParallelism) BEFORE the grouped-map. Without this, AQE
    right-sizes the shuffle by byte count and coalesces a small-byte /
    high-group-count input down to one partition — serializing every
    per-group Python invocation through a single worker (measured 4x
    slower at sf0.1). Python-bound stages must size partitions by CPU,
    not bytes; a user-specified repartition is exempt from AQE
    coalescing."""
    mult = float(10**scale)
    # Key type follows the input schema (string, int, ... — not assumed
    # BIGINT), same derivation notify_each_partition uses via df.dtypes.
    key_type = dict(df.dtypes)[key]
    out_schema = (
        f"{key} {key_type}, n BIGINT, median_value DOUBLE, spread DOUBLE"
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        v = pdf[value_col].astype(float)
        med = float(v.median())
        spread = float(v.max() - v.min())
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n": [len(pdf)],
                "median_value": [math.floor(med * mult + 0.5) / mult],
                "spread": [math.floor(spread * mult + 0.5) / mult],
            }
        )

    n_parts = parallelism or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(key, value_col)
        .repartition(n_parts, key)
        .groupBy(key)
        .applyInPandas(stats, schema=out_schema)
    )


def ce_key_udf():
    """Cross-encoder stand-in scorer for the retrieve->rerank pipeline
    (queries.q_rerank_crossencoder): a deterministic md5 over
    (query_id, doc_id, first 16 chars of text), returned as the 8-hex
    ordering key. Arrow-batched like a real model would be — swap the
    body for tokenizer+forward pass and the batch shape, join, and
    ranking around it are already proven. Deterministic so the whole
    pipeline stays value-checked against the SQL oracle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def ce_key(
        qid: pd.Series, did: pd.Series, text: pd.Series
    ) -> pd.Series:
        import hashlib

        return pd.Series(
            hashlib.md5(
                f"{q}:{d}:{(t or '')[:16]}".encode()
            ).hexdigest()[:8]
            for q, d, t in zip(qid, did, text)
        )

    return ce_key


def price_bucket_iter_udf(breaks: list[float]):
    """Iterator-of-Series scalar pandas UDF (the §2.8 form this module
    lacked): assigns each price the index of its bucket via binary
    search over ``breaks``. The iterator form exists for exactly this
    shape — one-off setup (here building the search table; in
    production loading a model/tokenizer) runs ONCE per TASK and is
    amortized across all the Arrow batches that task streams through
    the worker, instead of once per batch as a plain pandas_udf
    closure would. (Spark re-enters the function per task the worker
    executes — the reuse unit is the task's batch stream, not the
    worker process lifetime.) Deterministic integer output keeps it
    value-checkable (the oracle is a CASE ladder)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bucket(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import bisect

        table = sorted(breaks)  # one-off per-task setup
        for prices in batches:
            yield prices.map(
                lambda p: bisect.bisect_right(table, float(p))
            ).astype("int32")

    return bucket


def grouped_balance_stats_arrow(
    df: DataFrame, key: str, balance_col: str
) -> DataFrame:
    """Grouped map via ``applyInArrow`` (Spark 4's Arrow-native grouped
    surface, §2.8): per-group balance statistics computed directly on
    pyarrow arrays — no pandas materialization at all, the cheapest
    Python grouped path (one Arrow table in, one out, zero pandas
    boxing). All outputs are exact integers: balances become cents via
    floor(x*100 + 0.5) BEFORE summation, so the result is
    addition-order-independent and value-checkable even though Arrow
    sees group rows in arbitrary post-shuffle order."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(tbl: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(tbl[balance_col], pa.scalar(100.0)), 0.5)
            ),
            pa.int64(),
        )
        return pa.table(
            {
                key: pa.array([tbl[key][0].as_py()], pa.int64()),
                "n_rows": pa.array([tbl.num_rows], pa.int64()),
                "sum_cents": pa.array(
                    [pc.sum(cents).as_py()], pa.int64()
                ),
                "min_cents": pa.array(
                    [pc.min(cents).as_py()], pa.int64()
                ),
                "max_cents": pa.array(
                    [pc.max(cents).as_py()], pa.int64()
                ),
            }
        )

    out_schema = (
        f"{key} bigint, n_rows bigint, sum_cents bigint, "
        "min_cents bigint, max_cents bigint"
    )
    return df.groupBy(key).applyInArrow(stats, schema=out_schema)
