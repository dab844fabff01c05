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

Delivery semantics: **at-least-once**. The send runs as an eager
action inside this call (never lazily attached to the returned
DataFrame), so one call = one delivery pass; but a Spark task that
fails or is speculatively re-executed re-sends its partition, so the
receiver must tolerate duplicates (idempotent endpoint or dedup on
``id_col`` downstream).
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
