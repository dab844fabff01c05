"""The reference's REST extractor as a first-class Spark data source
(Spark 4 Python DataSource API) — `spark.read.format("rest_orders")`.

Where sources/rest.py models the fetch as a task-grid DataFrame +
mapInPandas, this is the idiomatic end state: the (day, page) grid
becomes the source's InputPartitions, so Spark schedules one task per
page, retries/speculation work at the task level, and the fetch
composes with every reader feature (select pruning, downstream
repartition) like any built-in format.

Partition planning mirrors the reference's pagination loop
(`extract-app/app.py:100-161`: 100 records/page, 3 retries/page,
day-by-day window): one InputPartition per (fetch_date, page). The
HTTP call is injected via the module-level ``fetch_page`` hook —
production swaps in a real client; the default is the same
deterministic fake the oracle reproduces (no network in tests).
"""

from __future__ import annotations

from datetime import date, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

MAX_RETRIES = 3

SCHEMA_DDL = "order_id string, fetch_date string, page int, amount double"


def fetch_page(fetch_date: str, page: int) -> list[dict]:
    """Deterministic fake HTTP page fetch (injection point). Returns the
    same record shape as sources/rest.py's S1 fake so the DuckDB oracle
    can reproduce the rows arithmetically."""
    return [
        {
            "order_id": f"{fetch_date}#p{page}#r{i}",
            "fetch_date": fetch_date,
            "page": page,
            "amount": float(page * 100 + i),
        }
        for i in range(5)
    ]


class RestPagePartition(InputPartition):
    def __init__(self, fetch_date: str, page: int):
        self.fetch_date = fetch_date
        self.page = page


class RestOrdersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = date.fromisoformat(options.get("start_date", "2024-01-01"))
        self.n_days = int(options.get("n_days", 3))
        self.max_pages = int(options.get("max_pages", 2))

    def partitions(self) -> list[InputPartition]:
        return [
            RestPagePartition((self.start + timedelta(days=d)).isoformat(), p)
            for d in range(self.n_days)
            for p in range(1, self.max_pages + 1)
        ]

    def read(self, partition: RestPagePartition) -> Iterator[tuple]:
        rows: list[dict] = []
        for attempt in range(MAX_RETRIES):
            try:
                rows = fetch_page(partition.fetch_date, partition.page)
                break
            except Exception:
                if attempt == MAX_RETRIES - 1:
                    rows = []  # page skipped, extract survives
        for r in rows:
            yield (r["order_id"], r["fetch_date"], r["page"], r["amount"])


class RestOrdersStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the extractor (Spark 4 Python streaming data
    source): each microbatch ingests ONE fetch day's pages and the
    OFFSET — {"day_index": n} — is owned by the engine's checkpoint,
    so restart/recovery replays exactly the uncommitted days via
    ``readBetweenOffsets`` (deterministic fetch => exactly-once into
    the sink, the property the reference's run-diffing loop
    `extract-app/app.py:142-147` approximates after the fact). Days
    beyond the window return empty batches with an unchanged offset —
    the stream idles rather than fabricating data; the caller stops it
    once the committed offset reaches the window end."""

    def __init__(self, options: dict):
        self.start = date.fromisoformat(
            options.get("start_date", "2024-01-01")
        )
        self.n_days = int(options.get("n_days", 3))
        self.max_pages = int(options.get("max_pages", 2))

    def initialOffset(self) -> dict:
        return {"day_index": 0}

    def _day_rows(self, day_index: int) -> Iterator[tuple]:
        fd = (self.start + timedelta(days=day_index)).isoformat()
        for page in range(1, self.max_pages + 1):
            rows: list[dict] = []
            for attempt in range(MAX_RETRIES):
                try:
                    rows = fetch_page(fd, page)
                    break
                except Exception:
                    if attempt == MAX_RETRIES - 1:
                        rows = []
            for r in rows:
                yield (
                    r["order_id"], r["fetch_date"], r["page"], r["amount"]
                )

    def read(self, start: dict):
        d = int(start["day_index"])
        if d >= self.n_days:
            return iter([]), start  # idle: window exhausted
        # list-backed iterator, NOT a generator: the engine's prefetch
        # cache copy.copy()s the iterator to serve planning and
        # execution from one fetch, and generators are uncopyable
        return iter(list(self._day_rows(d))), {"day_index": d + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for d in range(int(start["day_index"]), int(end["day_index"])):
            yield from self._day_rows(d)


class RestOrdersDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_orders"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return RestOrdersReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return RestOrdersStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration; after this,
    ``spark.read.format("rest_orders").options(...)`` works."""
    spark.dataSource.register(RestOrdersDataSource)
