"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.9 extension).

The reference has no streaming at all (strictly daily batch,
``Composer/DAG_cloudrun_dataflow_sp.py:40``); this is the engine's
arbitrary-stateful surface: per-key state that survives across
micro-batches, the building block for sessionization, CDC-style
running upserts, and online feature aggregation.

Semantics: events for a user belong to one session while consecutive
gaps are <= ``gap_seconds``; the operator maintains per-user state
(last event time, session count, event count) and emits the running
totals each micro-batch. With ``Trigger.AvailableNow`` over a static
source the final emission equals the batch sessionization exactly,
which is how the DuckDB oracle checks it.

Scale posture: state lives in the executor state store partitioned by
the group key (one shuffle per batch on user_id); each group's batch
slice crosses to Python as ONE Arrow batch. In production you'd add a
``GroupStateTimeout`` to expire idle users and bound the store; with a
finite replay the NoTimeout form is deterministic, which the oracle
needs. Batches must arrive time-ordered per key for exactness (true
for replay / AvailableNow over date-partitioned files; a real deploy
would put a watermark-sorted window upstream).
"""

from __future__ import annotations

import tempfile
import uuid
from typing import Any, Iterable, Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from aproximacion_1_etl_spark.streaming.events import read_events_stream

_OUT_DDL = "user_id BIGINT, n_sessions BIGINT, n_events BIGINT"
_STATE_DDL = "last_sec DOUBLE, n_sessions BIGINT, n_events BIGINT"


def _sessionize_group(
    key: Any,
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
    gap_seconds: float,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_sec, n_sessions, n_events = state.get
    else:
        last_sec, n_sessions, n_events = None, 0, 0
    for pdf in pdf_iter:
        secs = (
            pdf["ts"].astype("int64").to_numpy() / 1e9
        )  # datetime64[ns] -> epoch seconds
        order = pdf.assign(_s=secs).sort_values(["_s", "event_id"])
        for s in order["_s"].to_numpy():
            if last_sec is None or (s - last_sec) > gap_seconds:
                n_sessions += 1
            last_sec = float(s)
            n_events += 1
    state.update((last_sec, n_sessions, n_events))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        }
    )


def sessionize_stateful(events: DataFrame, gap_seconds: float = 7200.0) -> DataFrame:
    """Wire the stateful sessionizer onto a streaming events frame."""

    def fn(key, pdf_iter, state):
        return _sessionize_group(key, pdf_iter, state, gap_seconds)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_OUT_DDL,
        stateStructType=_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_sessions(
    spark: SparkSession,
    source_dir: str,
    glob: str = "events.parquet",
    gap_seconds: float = 7200.0,
) -> DataFrame:
    """Run sessionization as a real stream (AvailableNow), return the
    final per-user totals. Running emissions from earlier micro-batches
    are superseded by taking the max totals per user (both counters are
    monotone), so the result is batch-equivalent regardless of how the
    source splits into batches."""
    table = f"stateful_sessions_{uuid.uuid4().hex[:8]}"
    stream = sessionize_stateful(
        read_events_stream(spark, source_dir, glob), gap_seconds
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(table)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_state_"))
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(table)
        .groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
    )
