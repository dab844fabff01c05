"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``aproximacion_1_etl_spark/`` (the queries/
and oracles/ packages); this file is the thin adapter the driver
imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aproximacion_1_etl_spark.oracles import ALL_ORACLES  # noqa: E402
from aproximacion_1_etl_spark.plans.runner import flagship  # noqa: E402
from aproximacion_1_etl_spark.queries import ALL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key. As of round 3 every key
    has a value oracle: approximate-sketch queries hash the exact value
    plus an in-plan error-bound boolean, and pagerank's decimal-cast
    contribution sums make its ranks engine-portable."""
    return dict(ALL_ORACLES)
