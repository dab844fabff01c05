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
