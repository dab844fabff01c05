"""Multimodal column plumbing (SURVEY.md §2.10).

Media (image/audio/video) ride through the engine as opaque ``binary``
columns plus a typed metadata struct; decode / feature-extract runs as
Arrow-batched pandas functions over ``mapInPandas`` so the Python cost
is per-batch, not per-row, and the operator distributes like any other
DataFrame transform (no driver-side loops, partition-preserving).

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_stub_features`` computes deterministic byte-level
features (length / first byte / modular checksum) so the Spark-side
plumbing — schema, batch iteration, UDF signature, partitioning — is
real and testable, and a real decoder is a drop-in replacement for the
one marked function. ``real_decode`` raises NotImplementedError to make
the boundary explicit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, payload BINARY, "
    "meta_width INT, meta_height INT"
)

FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, byte_len BIGINT, "
    "first_byte INT, checksum BIGINT"
)


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media table from documents: payload = UTF-8 bytes of the
    text (a deterministic fake asset), media_type derived from doc_id,
    metadata struct fields typed. In production the payload column comes
    straight from parquet/avro binary fields."""
    return docs.select(
        F.col("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        (F.col("doc_id") % 640).cast("int").alias("meta_width"),
        (F.col("doc_id") % 480).cast("int").alias("meta_height"),
    )


def real_decode(payload: bytes, media_type: str):
    """The real decoder hook (PIL/librosa/ffmpeg in production)."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; decode_stub_features provides the deterministic stub"
    )


def decode_stub_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Deterministic stub features: byte length, first byte value, sum of
    bytes mod 997. Arrow-batched: each pandas batch is processed
    vectorized; the operator is a narrow map (no shuffle)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "checksum": payloads.map(
                        lambda b: sum(b) % 997
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit one row per
    sampled 'frame' (fixed-size byte slice standing in for a decoded
    frame). Shows the 1->N mapInPandas fan-out shape used by real
    frame extraction."""
    frame_bytes = 16

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_no": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // frame_bytes, 0)
                for i in range(0, n_frames, every_nth):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame"].append(
                        bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "video").mapInPandas(
        sample, schema="doc_id BIGINT, frame_no INT, frame BINARY"
    )
