"""Binary-file source — the multimodal ingest path (SURVEY.md §2.10).

Spark's ``binaryFile`` format reads whole files as
(path, modificationTime, length, content BINARY) rows — the standard
way raw image/audio/video assets enter a DataFrame pipeline before
Pandas-UDF decode (text/multimodal.py). The reference's analog is the
whole-file JSON read (``src/1_run_main_table_pipeline.py:122-124``);
here the payload stays opaque bytes instead of being parsed.

At scale: binaryFile is NOT splittable (one file = one row = one task
input); parallelism comes from file count, and
``spark.sql.files.maxPartitionBytes`` groups small files per task.
Millions of tiny assets should be compacted into parquet
(attach_media's shape) after first ingest — this source is the
landing-zone reader, not the steady-state store.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_doc_files(
    docs, out_dir: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Materialize each doc as a standalone ``<doc_id>.bin`` file (the
    test stand-in for an object-store landing zone of media assets).
    Driver-side loop is test-fixture-only; production assets arrive
    from outside the engine."""
    os.makedirs(out_dir, exist_ok=True)
    for row in docs.select(id_col, text_col).collect():
        with open(os.path.join(out_dir, f"{row[id_col]}.bin"), "wb") as f:
            f.write(row[text_col].encode("utf-8"))


def read_binary_files(
    spark: SparkSession, path: str, glob: str = "*.bin"
) -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def binary_ingest_manifest(files: DataFrame, id_from_name: bool = True) -> DataFrame:
    """Ingest manifest from a binaryFile scan: stable id (parsed from
    the file name), byte length, and content digest — the dedup /
    integrity key for a media landing zone."""
    base = files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )
    if id_from_name:
        base = base.withColumn(
            "doc_id",
            F.regexp_extract(F.col("file_name"), "([0-9]+)[.]bin$", 1).cast(
                "bigint"
            ),
        )
    return base.select("doc_id", "n_bytes", "content_md5")
