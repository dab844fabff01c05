"""Bucketed table layout: shuffle-free co-located joins (SURVEY.md §4).

The reference re-shuffles inside BigQuery on every stored-procedure
join (`Composer/DAG_cloudrun_dataflow_sp.py:114-278` — 29 sequential
SPs, each joining child aggregates back to the master on
delivery_order_id). On Spark the equivalent repeated join key is a
one-time layout decision: write both tables bucketed BY THE JOIN KEY
into the catalog, and every subsequent equi-join on that key is
exchange-free — each bucket pair joins locally, no shuffle of either
side, across EVERY stage of the refinement chain.

This is the single biggest structural win at 100 TB: the master/child
join in the reference's SP chain happens ~13 times per daily run; with
both tables bucketed the data crosses the network once (at write
time), not 13 times.

Local caveat baked into ``enable_bucketing``: bucketed reads require
``spark.sql.sources.bucketing.enabled`` (on by default) and the number
of read tasks equals the bucket count, so pick buckets ~= cluster
cores at the target scale (thousands on a real cluster; small here).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) by the join key. Sorting within buckets additionally lets
    sort-merge joins skip their sort step."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a previously-killed run can leave an orphan managed-table dir that
    # blocks re-creation (LOCATION_ALREADY_EXISTS) — clear it
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    leftover = os.path.join(warehouse, table_name.lower())
    if os.path.isdir(leftover):
        shutil.rmtree(leftover, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With matching bucket counts the sort-merge plan contains NO
    Exchange on either side (verified in tests/test_scale_ops.py).

    At test scale Catalyst prefers broadcasting the small side (and
    then ignores bucketing — correctly, broadcast is cheaper there);
    ``force_sort_merge`` pins the plan the join gets at 100 TB, where
    neither side fits a broadcast."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    if force_sort_merge:
        rt = rt.hint("merge")
    return lt.join(rt, on=on, how=how)
