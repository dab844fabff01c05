"""The E3-equivalent linear driver (SURVEY.md §3): what the reference
spreads over an Airflow DAG of 35 sequential tasks (extract -> 5 Beam
pipelines -> 29 BigQuery stored procedures) collapses here into one
driver program building ONE Catalyst plan per output table.

Role mapping onto the driver testdata (FIXTURES.md §B):
``orders`` = delivery_order_master (wide parent), ``lineitem`` =
packages/items children, ``events`` = events_info child keyed by
user_id (== customer key), dimensions = enrichment lookups.

The chain (mirrors DAG order at ``Composer/DAG_cloudrun_dataflow_sp.py:
323-362``): M1 dedup -> M5/M7 child rollups -> M4 latest-status ->
M10 first-scheduled -> update-by-join passes -> final work table.
All joins are key-equi on the parent key; the child aggregates are
pre-shrunk before joining (|keys| rows, not |child| rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _fround(col, n: int = 2):
    """Engine-portable rounding (see queries._fround)."""
    f = float(10 ** n)
    return F.floor(col * F.lit(f) + F.lit(0.5)) / F.lit(f)

from aproximacion_1_etl_spark.operators.refine import (
    child_rollup,
    dedup_latest,
)
from aproximacion_1_etl_spark.sources.tables import load_table


def run_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the delivery_order_work-equivalent table: one row per
    order, enriched with child rollups and latest-event attributes."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    # M1: dedup the parent (idempotent re-ingest tolerance)
    master = dedup_latest(
        orders,
        keys=["o_orderkey"],
        order_by=[F.col("o_orderdate").desc(), F.col("o_custkey").desc()],
    )

    # M5/M7: per-order child rollup (packages-per-order analog)
    items = child_rollup(
        lineitem,
        keys=["l_orderkey"],
        aggs={
            "n_items": F.count("*"),
            "sum_qty": F.round(F.sum("l_quantity"), 2),
            "revenue": _fround(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(30,8)")
                ).cast("double"),
                2,
            ),
        },
    )

    # M4 + M10 fused: the reference runs latest-status and
    # first-scheduled as separate UPDATE SPs (DAG:114-136, 248-254);
    # both are per-user aggregates over the same child, so ONE
    # partial-agged shuffle computes them together (max_by with a
    # (ts, id) struct for deterministic latest, min for first) —
    # one events pass and one join instead of two of each.
    ord_key = F.struct(F.col("ts"), F.col("event_id"))
    user_state = events.groupBy("user_id").agg(
        F.max_by("event_type", ord_key).alias("latest_event_type"),
        F.max_by("value", ord_key).alias("latest_value"),
        F.min("ts").alias("scheduled_ts"),
    )

    # Update-by-join passes onto the work table
    work = (
        master.join(items, master["o_orderkey"] == items["l_orderkey"], "left")
        .drop("l_orderkey")
        .join(user_state, master["o_custkey"] == user_state["user_id"], "left")
        .drop("user_id")
    )
    return work.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        F.coalesce("sum_qty", F.lit(0.0)).alias("sum_qty"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.col("latest_event_type"),
        _fround(F.col("latest_value"), 2).alias("latest_value"),
        F.date_format("scheduled_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "first_event_ts"
        ),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship rollup over the work table: order-lifecycle summary per
    (status, latest event type) — the compact, stable-schema result the
    driver smoke-checks."""
    work = run_daily(spark, sf_dir)
    return (
        work.groupBy("o_orderstatus", "latest_event_type")
        .agg(
            F.count("*").alias("n_orders"),
            _fround(
                F.sum(F.col("revenue").cast("decimal(30,8)")).cast("double"),
                2,
            ).alias("total_revenue"),
            _fround(F.avg("n_items"), 4).alias("avg_items"),
        )
        .orderBy("o_orderstatus", "latest_event_type")
    )


def run_daily_job(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """The full daily-run entry point (E3): build the work table, land
    it as parquet (S7), write the per-status metadata sidecar (S4),
    return a run summary. What the reference needs Airflow + Cloud Run
    + 5 Dataflow jobs + 29 SPs for (DAG:323-362) is this one function."""
    import json as _json
    import os as _os

    work = run_daily(spark, sf_dir)
    work_path = _os.path.join(out_dir, "delivery_order_work")
    work.write.mode("overwrite").parquet(work_path)

    landed = spark.read.parquet(work_path)
    meta = landed.groupBy("o_orderstatus").agg(
        F.count("*").alias("total_ordenes"),
        F.count(F.when(F.col("latest_event_type").isNull(), 1)).alias(
            "sin_eventos"
        ),
    )
    meta_path = _os.path.join(out_dir, "metadata")
    meta.coalesce(1).write.mode("overwrite").json(meta_path)

    # Post-publish data-quality gate (the validation the reference's
    # 29-SP chain never does): row rules fused into one scan of the
    # landed table + a PK uniqueness check; violations land beside the
    # data and in the run summary.
    from aproximacion_1_etl_spark.functions.quality import (
        row_rule_violations,
        unique_violations,
    )

    dq = row_rule_violations(
        landed,
        {
            "orderkey_not_null": F.col("o_orderkey").isNull(),
            "totalprice_positive": F.col("o_totalprice") <= 0,
            "n_items_non_negative": F.col("n_items") < 0,
        },
    ).unionByName(unique_violations(landed, ["o_orderkey"], "orderkey_unique"))
    dq_rows = dq.collect()
    dq.sparkSession.createDataFrame(dq_rows, dq.schema).coalesce(1).write.mode(
        "overwrite"
    ).json(_os.path.join(out_dir, "dq_report"))

    summary = {
        "rows": landed.count(),
        "statuses": meta.count(),
        "dq_violations": {r["rule"]: r["n_violations"] for r in dq_rows},
        "out": work_path,
    }
    with open(_os.path.join(out_dir, "run_summary.json"), "w") as f:
        _json.dump(summary, f)
    return summary


def main() -> None:
    import argparse
    import json as _json

    from aproximacion_1_etl_spark.session import get_spark

    ap = argparse.ArgumentParser(description="Run the daily work-table build")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    spark = get_spark("daily-runner")
    spark.sparkContext.setLogLevel("ERROR")
    print(_json.dumps(run_daily_job(spark, args.sf_dir, args.out)))


if __name__ == "__main__":
    main()
