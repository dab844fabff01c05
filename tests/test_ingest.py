"""Ingestion-layer tests against the reference-shaped fixture
(FIXTURES.md §A): whole-file JSON arrays, metadata-sidecar exclusion,
corrupt-file tolerance, day partitioning.

Mirrors the reference's only unit test (re-serialization round-trip +
graceful handling of invalid input,
``alas_dataflow_1_repository/.../tests/test_process_json_file.py:18-35``)
but through the engine's real readers.
"""

import json
import os

import pyspark.sql.functions as F

from aproximacion_1_etl_spark.sources.json_ingest import (
    metadata_sidecar,
    read_day_files,
    split_corrupt,
)

ORDER_DDL = (
    "delivery_order_id STRING, code STRING, recycling BOOLEAN, "
    "size_box STRING, delivery_attemps BIGINT, "
    "destination STRUCT<street: STRING, structure_id: BIGINT, "
    "geo_location: STRUCT<lat: DOUBLE, lon: DOUBLE>>, "
    "events_info_json STRING"
)


def _write_day_layout(tmp_path):
    """Reference layout: {day}/{day}.json (one JSON array per file) +
    metadata sidecar that must be excluded + one corrupt file."""
    day1 = tmp_path / "2024-03-01"
    day1.mkdir()
    orders = [
        {
            "delivery_order_id": "DO-1",
            "code": "C-1",
            "recycling": False,
            "size_box": "M2",
            "delivery_attemps": 2,
            "destination": {
                "street": "Evergreen",
                "structure_id": 13123,
                "geo_location": {"lat": -33.45, "lon": -70.65},
            },
            "events_info_json": json.dumps(
                [{"status": 1, "timestamp": "2024-03-01T10:15:30.123456"}]
            ),
        },
        {
            "delivery_order_id": "DO-2",
            "code": "",
            "recycling": None,
            "size_box": "XL9",
            "delivery_attemps": 0,
            "destination": {"street": None, "structure_id": 1},
            "events_info_json": None,
        },
    ]
    (day1 / "2024-03-01.json").write_text(json.dumps(orders))
    (day1 / "2024-03-01_metadata.json").write_text(
        json.dumps({"fecha": "2024-03-01", "total_ordenes": 2, "fallos": 0})
    )
    day2 = tmp_path / "2024-03-02"
    day2.mkdir()
    (day2 / "2024-03-02.json").write_text("{ this is not valid json !!")
    return tmp_path


def test_multiline_array_read_excludes_metadata(spark, tmp_path):
    root = _write_day_layout(tmp_path)
    df = read_day_files(spark, f"{root}/*", schema_ddl=ORDER_DDL)
    clean, corrupt = split_corrupt(df)
    rows = {r["delivery_order_id"]: r for r in clean.collect()}
    # metadata sidecar rows must NOT appear (they'd parse as nulls)
    assert set(rows) == {"DO-1", "DO-2"}
    # nested-path extraction with missing-key tolerance (P2)
    assert rows["DO-1"]["destination"]["geo_location"]["lat"] == -33.45
    assert rows["DO-2"]["destination"]["geo_location"] is None
    # corrupt file skipped but counted (F6)
    assert corrupt.count() == 1


def test_explode_child_from_fixture(spark, tmp_path):
    root = _write_day_layout(tmp_path)
    df, _ = split_corrupt(read_day_files(spark, f"{root}/*", schema_ddl=ORDER_DDL))
    from aproximacion_1_etl_spark.operators.explode import explode_json_array

    child = explode_json_array(
        df,
        json_col="events_info_json",
        element_schema_ddl="status INT, timestamp STRING",
        parent_keys=["delivery_order_id"],
    )
    rows = child.collect()
    # null array -> no rows (P9); DO-1's single event carries parent key
    assert len(rows) == 1
    assert rows[0]["delivery_order_id"] == "DO-1"
    assert rows[0]["status"] == 1


def test_metadata_sidecar_counts(spark, tmp_path):
    root = _write_day_layout(tmp_path)
    df, _ = split_corrupt(read_day_files(spark, f"{root}/*", schema_ddl=ORDER_DDL))
    df = df.withColumn("ingest_date", F.lit("2024-03-01"))
    side = metadata_sidecar(df).collect()
    assert side[0]["total_ordenes"] == 2


def test_rest_datasource_plans_one_task_per_page(spark):
    """Python DataSource API: the (day, page) grid must become real
    InputPartitions (task-level retry/speculation), and the rows must
    match the task-grid implementation in sources/rest.py."""
    from aproximacion_1_etl_spark.sources.rest_datasource import register

    register(spark)
    df = (
        spark.read.format("rest_orders")
        .option("start_date", "2024-01-01")
        .option("n_days", 4)
        .option("max_pages", 3)
        .load()
    )
    assert df.rdd.getNumPartitions() == 12  # 4 days x 3 pages
    assert df.count() == 12 * 5
    one = df.filter(
        (df.fetch_date == "2024-01-02") & (df.page == 2)
    ).collect()
    assert {r.order_id for r in one} == {
        f"2024-01-02#p2#r{i}" for i in range(5)
    }
    assert all(r.amount == 200.0 + int(r.order_id[-1]) for r in one)


def test_rest_stream_reader_offsets_and_replay():
    """The streaming REST reader's offset protocol (pure Python — no
    Spark needed): read() advances one day per call, idles with an
    UNCHANGED offset past the window, and readBetweenOffsets replays
    exactly the rows of the committed range — the determinism
    exactly-once recovery rests on."""
    from aproximacion_1_etl_spark.sources.rest_datasource import (
        RestOrdersStreamReader,
    )

    r = RestOrdersStreamReader(
        {"start_date": "2024-01-01", "n_days": 2, "max_pages": 2}
    )
    off0 = r.initialOffset()
    assert off0 == {"day_index": 0}
    rows_d0, off1 = r.read(off0)
    rows_d0 = list(rows_d0)
    assert off1 == {"day_index": 1}
    assert len(rows_d0) == 2 * 5  # pages x records
    assert all(row[1] == "2024-01-01" for row in rows_d0)
    rows_d1, off2 = r.read(off1)
    rows_d1 = list(rows_d1)
    assert off2 == {"day_index": 2}
    # window exhausted: idle, offset unchanged, no rows
    idle_rows, off3 = r.read(off2)
    assert list(idle_rows) == [] and off3 == off2
    # recovery replay equals the original committed batches
    assert list(r.readBetweenOffsets(off0, off2)) == rows_d0 + rows_d1
