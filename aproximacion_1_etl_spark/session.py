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
        # Coalesce post-shuffle partitions by DATA VOLUME, not up to the
        # default parallelism: partition count should follow bytes (the
        # advisory size), so a 20 MB shuffle at sf0.1 runs 1-2 tasks and
        # a 100 TB shuffle still runs ~400k. With the default
        # parallelismFirst=true every tiny stage schedules 32 tasks and
        # fixed per-task overhead dominates iterative loops (measured:
        # pagerank 5.9s -> 3.6s at sf0.1). Genuinely CPU-bound Python
        # stages keep their parallelism via explicit repartition(N)
        # before the grouped map (operators/pandas_ops.py), which AQE
        # does not coalesce.
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        # Let AQE re-plan (and volume-coalesce) CACHED plans too —
        # default false pins every .cache() at the full
        # shuffle-partition count, so iterative loops over cached
        # relations (pagerank, connected components) schedule 32 map
        # tasks per stage no matter how tiny the data is.
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": (
            "true"
        ),
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


def cluster_conf(
    total_cores: int,
    input_tb: float,
    target_partition_mb: int = 256,
) -> dict[str, str]:
    """Sizing math for a real deployment, in one place.

    The two quantities that matter at 100 TB are (a) how many shuffle
    partitions keep each one near ``target_partition_mb`` and (b) how
    much each task reads per input split. Rules encoded:

    - shuffle partitions = max(2 x cores, input / target_size), so
      small stages still use every core twice over (slot pipelining)
      and big stages keep partitions spill-free. AQE coalesces the
      excess on small stages — overshooting is safe, undershooting is
      not (a 10 GB partition OOMs an executor no matter what AQE does).
    - input split = target_partition_mb too: scan tasks and shuffle
      tasks want the same memory envelope.
    - AQE advisory size = half the target: post-shuffle coalescing
      aims smaller so joins that EXPAND (explode, fan-out) stay under
      the envelope after growth.
    - broadcast threshold stays modest (64 MB): at 1000 executors a
      1 GB broadcast is a terabyte of aggregate network fan-out;
      bigger dims belong in a shuffle join or a bucketed layout.

    Example: 100 TB input, 1000 executors x 8 cores ->
    shuffle.partitions = max(16k, 100TB/256MB = ~410k) = 410k tasks,
    each ~256 MB — large task counts are what Spark's scheduler is FOR;
    the failure mode to avoid is the inverse (4k partitions x 25 GB).
    """
    input_mb = input_tb * 1024 * 1024
    parts = max(2 * total_cores, int(input_mb / target_partition_mb))
    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.files.maxPartitionBytes": f"{target_partition_mb}m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": (
            f"{target_partition_mb // 2}m"
        ),
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
    }
