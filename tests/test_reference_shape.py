"""Fidelity test on reference-shaped data: deeply nested delivery-order
JSON (scalar fields + array-of-struct sub-fields, reference
`src/1_run_main_table_pipeline.py:61-63`) through the full flow —
day-partitioned JSON files -> wide master with JSON-string array
columns (P12) -> child-table explosion with parent-key carry (F2/F3)
-> latest-event refinement (M4) — asserting exact values end-to-end."""

import json
import os
import tempfile

import pyspark.sql.functions as F

from aproximacion_1_etl_spark.operators.explode import explode_json_array
from aproximacion_1_etl_spark.operators.refine import latest_child_attrs


def _order(i: int, day: str) -> dict:
    return {
        "delivery_order_id": f"DO-{i:04d}",
        "ingest_date": day,
        "recycling": None if i % 4 == 0 else (i % 2 == 0),
        "size_box": f"M{i}edium{i}",
        "destination": {
            "street": f"Street {i}",
            "geo_location": {"lat": -33.0 - i * 0.01, "lon": -70.0 + i * 0.01},
        },
        "events_info_json": [
            {
                "status": f"status_{j}",
                "timestamp": f"2024-01-0{1 + j}T10:00:00.000000",
                "info": {"user_name": f"user_{i % 3}"},
            }
            for j in range(1 + i % 3)
        ],
    }


def test_nested_order_pipeline(spark):
    days = {"2024-01-05": range(0, 6), "2024-01-06": range(6, 10)}
    root = tempfile.mkdtemp(prefix="refshape_")
    for day, ids in days.items():
        os.makedirs(os.path.join(root, day))
        with open(os.path.join(root, day, f"{day}.json"), "w") as f:
            json.dump([_order(i, day) for i in ids], f)
        # metadata sidecar that ingestion must skip (S5)
        with open(
            os.path.join(root, day, f"{day}_metadata.json"), "w"
        ) as f:
            json.dump({"fecha": day, "total_ordenes": len(list(ids))}, f)

    raw = (
        spark.read.option("multiLine", True)
        .option("pathGlobFilter", "*.json")
        .json(root + "/*/")
        .filter(~F.input_file_name().contains("metadata"))
    )
    assert raw.count() == 10

    # wide master: flatten nested paths (P2), clean (P3-P5), stringify
    # the array field (P12) exactly as the reference's pipeline 1
    master = raw.select(
        "delivery_order_id",
        "ingest_date",
        F.coalesce("recycling", F.lit(False)).alias("recycling"),
        F.regexp_replace("size_box", "[0-9]", "").alias("size_box"),
        F.col("destination.street").alias("destination_street"),
        F.col("destination.geo_location.lat").alias("destination_lat"),
        F.to_json("events_info_json").alias("events_info_json"),
    )
    m = {r["delivery_order_id"]: r for r in master.collect()}
    assert m["DO-0000"]["recycling"] is False  # null -> default (P4)
    assert m["DO-0001"]["size_box"] == "Medium"  # digit strip (P5)
    assert abs(m["DO-0002"]["destination_lat"] + 33.02) < 1e-9  # P2

    # child explosion with parent-key carry (F2/F3) + strict ts parse (P7)
    events = explode_json_array(
        master,
        json_col="events_info_json",
        element_schema_ddl=(
            "status STRING, timestamp STRING, "
            "info STRUCT<user_name: STRING>"
        ),
        parent_keys=["delivery_order_id"],
        projections={
            "status": "status",
            "event_ts": "timestamp",
            "info_user_name": "info.user_name",
        },
    ).withColumn(
        "event_ts",
        F.try_to_timestamp(
            F.col("event_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        ),
    )
    # sum over i of (1 + i%3) for i in 0..9 = 10 + (0+1+2)*3 + 0+1 = 19
    assert events.count() == 19
    assert events.filter(F.col("event_ts").isNull()).count() == 0

    # M4: latest event status back onto the master
    latest = latest_child_attrs(
        events,
        keys=["delivery_order_id"],
        attrs=["status"],
        ts_col="event_ts",
        tiebreak="status",
    )
    work = master.join(latest, "delivery_order_id", "left")
    got = {
        r["delivery_order_id"]: r["latest_status"] for r in work.collect()
    }
    # order i has events status_0..status_(i%3); latest = status_(i%3)
    for i in range(10):
        assert got[f"DO-{i:04d}"] == f"status_{i % 3}"
