"""Success-notification sink (S10, SURVEY.md §2.1).

The reference POSTs a per-order confirmation back to the third party
after processing (`Case Study Documentation (English).md:10,37`). The
distributed form: ``foreachPartition`` — each executor task opens ONE
client session and sends its partition's rows in batches, so cost is
per-batch network round-trips, never per-row connections, and nothing
funnels through the driver.

The transport is injected (a callable) so tests use a file/list-backed
fake; production drops in a requests.Session poster. Failures are
retried per batch and surviving failures are RETURNED as data (a
DataFrame of failed ids) rather than raised — at 100 TB a notification
sink must not kill the job; the failure table feeds the metadata
sidecar (S4) like the reference's ``fallos`` count (app.py:166-171).

Delivery semantics: ``notify_each_partition`` is **at-least-once**
(the send runs as an eager action inside this call, so one call = one
delivery pass; but a failed/speculative task re-sends its partition).
``notify_idempotent`` upgrades that to **exactly-once per committed
ledger entry** via a delivery-ledger anti-join — re-runs and retried
passes skip everything a prior pass committed.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row


def notify_each_partition(
    df: DataFrame,
    id_col: str,
    send_batch: Callable[[list[dict]], list[str]],
    batch_size: int = 100,
    max_retries: int = 3,
) -> DataFrame:
    """Send every row as a notification, batched per partition.

    ``send_batch`` receives up to ``batch_size`` row-dicts and returns
    the ids it FAILED to deliver (empty list = all delivered); it must
    be picklable (it runs on executors). Retries each failing batch up
    to ``max_retries`` times (mirroring the extractor's per-page retry
    budget, reference app.py:100). Returns a DataFrame of
    (<id_col>, n_attempts) for rows still undelivered.

    The delivery pass executes EAGERLY here, exactly once per call
    (at-least-once per row — see module docstring): the per-partition
    send runs as a single distributed action whose only driver-side
    result is the (small) failure list, and the returned DataFrame is
    built locally from that list, so re-evaluating it never re-fires
    the side effect.
    """

    def run_partition(rows: Iterator[Row]) -> Iterator[tuple]:
        batch: list[dict] = []

        def flush() -> list[tuple]:
            if not batch:
                return []
            pending = list(batch)
            batch.clear()
            for attempt in range(1, max_retries + 1):
                failed_ids = set(send_batch(pending))
                pending = [
                    r for r in pending if str(r[id_col]) in failed_ids
                ]
                if not pending:
                    return []
            return [(r[id_col], max_retries) for r in pending]

        out: list[tuple] = []
        for row in rows:
            batch.append(row.asDict())
            if len(batch) >= batch_size:
                out.extend(flush())
        out.extend(flush())
        return iter(out)

    schema = f"{id_col} {dict(df.dtypes)[id_col]}, n_attempts INT"
    # collect() IS the action that fires the sends — once, here. Only
    # undelivered ids travel to the driver (normally ~zero rows), so
    # this is not a data-scale collect.
    failures = df.rdd.mapPartitions(run_partition).collect()
    return df.sparkSession.createDataFrame(failures, schema)


def notify_idempotent(
    df: DataFrame,
    id_col: str,
    send_batch: Callable[[list[dict]], list[str]],
    ledger_path: str,
    batch_size: int = 100,
    max_retries: int = 3,
) -> DataFrame:
    """Ledger-backed delivery: **exactly-once per committed ledger
    entry**. Before sending, ``df`` is anti-joined against the delivery
    ledger (a parquet table of already-delivered ids), so a retried or
    re-run pass — the reference re-runs its whole daily chain on
    failure (`Composer/DAG_cloudrun_dataflow_sp.py` retries) — cannot
    double-send anything a previous pass committed. After the send,
    delivered ids are appended to the ledger.

    Semantics, precisely: the send itself is at-least-once WITHIN one
    uncommitted pass (a speculative/failed Spark task may re-fire its
    partition before the ledger append lands — no side-effecting sink
    can do better without a transactional receiver), but every id whose
    delivery was committed to the ledger is never sent again by any
    later call. Pair with ``id_col`` as the receiver's idempotency key
    to close the residual window. Returns the failure table (rows still
    undelivered after retries); failed ids are NOT committed, so the
    next pass retries exactly those.
    """
    spark = df.sparkSession
    # "No ledger yet" must be decided by an explicit existence check,
    # not by swallowing read errors: a corrupt ledger (crashed append)
    # or transient IO failure silently treated as "first pass" would
    # re-send every previously committed id, breaking the exactly-once
    # guarantee without any signal. Unexpected read errors propagate.
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(ledger_path)
    fs = jpath.getFileSystem(hconf)
    if fs.exists(jpath):
        ledger = spark.read.parquet(ledger_path).select(id_col)
        to_send = df.join(ledger, id_col, "left_anti")
    else:  # first pass: no ledger yet
        to_send = df
    failures = notify_each_partition(
        to_send, id_col, send_batch, batch_size, max_retries
    )
    # commit point: ids sent this pass (and not in the failure table)
    # land in the ledger; the sends already happened eagerly above, so
    # this re-evaluates only the pure anti-join plan, never the sink
    delivered = to_send.select(id_col).join(
        failures.select(id_col), id_col, "left_anti"
    )
    delivered.write.mode("append").parquet(ledger_path)
    return failures
