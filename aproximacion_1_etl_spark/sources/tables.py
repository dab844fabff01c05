"""Parquet table catalog (the engine's BigQuery-table analog).

The reference lands data in BigQuery tables (reference
``src/1_run_main_table_pipeline.py:125-130``, WriteToBigQuery with
explicit schema, CREATE_IF_NEEDED / WRITE_APPEND). Here the at-rest
format is Parquet: columnar, splittable, predicate-pushdown-friendly —
the right substrate for a 100 TB Spark deployment.

Readers take explicit paths so the same code serves
``/root/testdata/sf*`` locally and object-store URIs on a cluster.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-join these (well under any
# reasonable autoBroadcastJoinThreshold even at 100 TB fact scale —
# dims grow with catalog size, not event volume).
BROADCAST_DIMS = ("region", "nation", "customer", "supplier", "part")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Column pruning + filter pushdown reach the
    parquet scan because we return the raw scan and let callers select.

    Timestamp columns are normalized to session-timezone TIMESTAMP
    (LTZ, with the session pinned to UTC — session.py) no matter how
    the file stored them, so downstream epoch math and DuckDB hash
    parity hold across generator versions:

    - nanosecond int64 timestamps (not readable by the vectorized
      reader) come in as raw nanos (``nanosAsLong``) and are truncated
      to microseconds — the same truncation DuckDB applies;
    - microsecond no-tz timestamps would otherwise surface as
      TIMESTAMP_NTZ under Spark 4's NTZ inference, which rejects
      ``cast(double)`` epoch math — we disable the inference so naive
      file values mean UTC wall-clock, exactly DuckDB's reading.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set(
            "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
        )
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Table sink: append, auto-create (operator S7,
    reference ``src/1_run_main_table_pipeline.py:125-130``).

    ``partition_by`` gives at-rest partition pruning (the Spark analog of
    the reference's day-partitioned GCS layout, ``app.py:122-133``).
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_table(
    spark: SparkSession,
    path: str,
    target_partitions: int,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """Small-file compaction: rewrite a parquet directory into
    ``target_partitions`` files (per partition dir if ``partition_by``).
    ``sort_by`` additionally clusters rows on the given key(s) during
    the rewrite (range partition + in-file sort) so post-compaction
    scans with predicates on those keys skip row groups via parquet
    min/max stats.

    Small files are the chronic failure mode of long-appended tables
    (the reference appends per day-file via streaming inserts,
    ``src/1_run_main_table_pipeline.py:125-130``; at 100 TB a scan over
    millions of KB-size files is listing-bound, not IO-bound).

    Swap protocol: the compacted copy is written to a sibling dir on
    the SAME filesystem as ``path`` (so both renames are true renames,
    never cross-device copies), any stale backup from a prior failed
    run is cleared first, then ``path`` is swapped out and back in two
    renames. Readers that open the table in the instant between the
    two renames see a missing path — for tables whose readers need
    snapshot isolation use ``versioned.compact_snapshot`` instead
    (manifest flip: the path never goes missing and the old version
    stays immutable); a crash between the renames here leaves the data
    intact under ``<path>._pre_compact`` for manual restore."""
    import shutil

    df = spark.read.parquet(path)
    base = path.rstrip("/")
    tmp = base + "._compact_tmp"
    backup = base + "._pre_compact"
    # Clear leftovers from a previous failed run (a stale non-empty
    # backup would make os.rename(path, backup) fail with ENOTEMPTY).
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(backup, ignore_errors=True)
    compacted = (
        df.repartition(target_partitions, *(partition_by or []))
        if partition_by
        else df.coalesce(target_partitions)
    )
    if sort_by:
        # Cluster rows while we are rewriting anyway: range-partition +
        # in-file sort gives every output file a tight min/max envelope
        # on the sort key, so selective scans skip whole row groups
        # (asserted in test_scale_ops::test_sorted_layout_tightens_
        # rowgroup_stats). The repartitionByRange replaces the plain
        # coalesce - same file count, clustered layout.
        if not partition_by:
            compacted = df.repartitionByRange(target_partitions, *sort_by)
        compacted = compacted.sortWithinPartitions(*sort_by)
    writer = compacted.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup, ignore_errors=True)
