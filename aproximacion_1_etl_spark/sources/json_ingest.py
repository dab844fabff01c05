"""Day-partitioned JSON file ingestion (operators S3, S5, S6, F1, F6).

The reference stores one JSON *array* file per calendar day at
``{execution_date}/{day}/{day}.json`` plus a ``{day}_metadata.json``
sidecar (reference ``extract-app/app.py:122-133,163-171``); readers list
files and drop anything whose name contains ``metadata`` (reference
``src/1_run_main_table_pipeline.py:27-53``), then whole-file
``json.load`` each file, tolerating corrupt files (``src/1_...py:67-68``).

Spark-first translation:
- one ``spark.read.json(multiLine=True)`` over the whole glob replaces
  the per-file Beam branches (S8) — Spark parallelizes by file natively;
- ``pathGlobFilter`` + an ``input_file_name()`` predicate replace the
  driver-side listing/filter loop;
- PERMISSIVE mode + ``columnNameOfCorruptRecord`` replaces the
  try/except-skip (F6) while keeping a countable record of corruption
  for the metadata sidecar (S4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_day_files(
    spark: SparkSession,
    path: str,
    schema_ddl: str | None = None,
    exclude_substring: str = "metadata",
    multiline: bool = True,
) -> DataFrame:
    """Read day-partitioned JSON array files, excluding metadata sidecars.

    With ``schema_ddl`` (string DDL, the Spark analog of the reference's
    ``"name:BQTYPE"`` schema strings, ``src/1_...py:95-116``) the scan is
    schema-ful and corrupt rows land in ``_corrupt_record`` instead of
    failing the job. ``multiline=True`` parses whole-file JSON arrays
    (the reference's file format, F1); ``multiline=False`` reads
    JSON-lines (Spark's own JSON sink format).
    """
    reader = (
        spark.read.option("multiLine", multiline)
        .option("pathGlobFilter", "*.json")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if schema_ddl:
        reader = reader.schema(f"{schema_ddl}, {CORRUPT_COL} STRING")
    df = reader.json(path)
    # exclusion matches the file NAME only (reference filters blob names,
    # src/1_...py:40) — a directory containing the substring must not
    # blank out the whole read
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return df.filter(~fname.contains(exclude_substring))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Separate clean rows from corrupt ones (F6). The corrupt side feeds
    the metadata sidecar's failure count (S4).

    The scan is cached: Spark forbids plans referencing only the internal
    corrupt-record column (SPARK-26716), and both halves re-read the same
    files anyway — one materialization serves both counts.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, corrupt


def write_day_partitioned(df: DataFrame, path: str, day_col: str = "ingest_date") -> None:
    """JSON sink, day-partitioned (S3): the Spark analog of one-file-per-day
    GCS layout. ``partitionBy`` gives readers partition pruning."""
    df.write.mode("overwrite").partitionBy(day_col).json(path)


def metadata_sidecar(df: DataFrame, day_col: str = "ingest_date") -> DataFrame:
    """Per-day summary (S4): {day, total_ordenes} — the reference's
    ``{fecha, total_ordenes, fallos}`` sidecar (``app.py:166-171``)."""
    return df.groupBy(day_col).agg(F.count("*").alias("total_ordenes"))
