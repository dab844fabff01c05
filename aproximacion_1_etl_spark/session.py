"""SparkSession factory.

Centralizes the configuration the whole engine relies on:

- ``spark.sql.session.timeZone = UTC`` — the reference mixes naive
  timestamps with an America/Santiago wall clock (reference
  ``extract-app/app.py:138``); we pin UTC and keep tz logic explicit so
  results are deterministic and oracle-comparable (SURVEY.md §7 risks).
- AQE on (runtime re-plan: partition coalescing, skew-join splitting) —
  at 100 TB this is what keeps shuffle partition sizing sane without
  hand-tuning per stage.
- Arrow on for any pandas-UDF path.

Tests/bench run on ``local[N]``; on a real cluster the same builder is
used with master/resources supplied externally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "aproximacion-1-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured — on a real deployment the
    master comes from spark-submit and this argument stays None.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Write timestamps as TIMESTAMP_MICROS, not the legacy INT96:
        # INT96 column chunks carry no min/max statistics, so sorted /
        # z-ordered layouts lose all row-group skipping on timestamp
        # keys (and INT96 is unreadable by most modern readers).
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        # ANSI off: the reference's parsing is permissive (null on
        # failure, reference src/2_...py:76-83); try_* functions plus
        # non-ANSI casts reproduce that contract.
        "spark.sql.ansi.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_scale(spark: SparkSession, target_partitions: int) -> None:
    """Adjust shuffle parallelism for a known data scale.

    At 100 TB with ~1000 executors you want shuffle partitions sized so
    each holds ~128-256 MB; callers that know their input volume call
    this before heavy stages. AQE will still coalesce small partitions.
    """
    spark.conf.set("spark.sql.shuffle.partitions", str(target_partitions))
