"""Multimodal column plumbing (SURVEY.md §2.10).

Media (image/audio/video) ride through the engine as opaque ``binary``
columns plus a typed metadata struct; decode / feature-extract runs as
Arrow-batched pandas functions over ``mapInPandas`` so the Python cost
is per-batch, not per-row, and the operator distributes like any other
DataFrame transform (no driver-side loops, partition-preserving).

``real_decode`` genuinely decodes the two formats a pure-Python parser
can own — PPM (P6) and uncompressed 24-bit BMP, header + pixel layout
including BMP's 4-byte row stride and bottom-up flip — and raises
NotImplementedError for formats that need real codec libraries (JPEG/
PNG/audio/video), which this container does not ship. The decoded path
runs end-to-end under ``decode_image_features`` (mapInPandas, integer
pixel sums so the oracle can value-check it); ``decode_stub_features``
keeps the byte-level stub for the opaque-payload case.
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


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255): header + row-major RGB bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): BGR pixel order,
    bottom-up rows, each row padded to a 4-byte boundary — the layout
    quirks a decoder must actually handle."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            row += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR
        row += b"\x00" * (stride - width * 3)
        body += row
    pixel_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_offset + len(body), 0, 0, pixel_offset
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return header + dib + bytes(body)


def real_decode(payload: bytes, media_type: str) -> dict:
    """Decode an image payload to (width, height, row-major RGB bytes).

    Pure-Python parsers for the formats that need no codec library:

    - **PPM (P6)**: ASCII header (magic, dims, maxval, ``#`` comments)
      followed by raw RGB. Returned as-is, top-down.
    - **BMP** (uncompressed, 24-bit, BITMAPINFOHEADER): pixel data at
      the offset named in the file header, BGR -> RGB, 4-byte row
      stride stripped, bottom-up rows flipped to top-down (a negative
      DIB height means already top-down).

    Anything else (JPEG/PNG/audio/video) raises NotImplementedError:
    those need real codec libraries this container does not ship, and
    a silent wrong-answer fallback would be worse than an explicit
    boundary."""
    import struct

    if payload[:2] == b"P6":
        # header tokens: magic, width, height, maxval; '#' comments
        # legal between any of them; single whitespace after maxval
        pos, tokens = 2, []
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
        width, height, maxval = (int(t) for t in tokens)
        if maxval != 255:
            raise ValueError(f"PPM maxval {maxval} unsupported (want 255)")
        pos += 1  # exactly one whitespace byte after maxval
        rgb = payload[pos : pos + width * height * 3]
        if len(rgb) != width * height * 3:
            raise ValueError("PPM payload truncated")
        return {"format": "ppm", "width": width, "height": height,
                "rgb": bytes(rgb)}
    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("BMP payload truncated")
        pixel_offset = struct.unpack_from("<I", payload, 10)[0]
        width, raw_h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise ValueError(
                f"BMP bpp={bpp} compression={compression} unsupported "
                "(want uncompressed 24-bit)"
            )
        height, bottom_up = abs(raw_h), raw_h > 0
        stride = (width * 3 + 3) & ~3
        rgb = bytearray(width * height * 3)
        for row in range(height):
            y = (height - 1 - row) if bottom_up else row
            base = pixel_offset + row * stride
            line = payload[base : base + width * 3]
            if len(line) != width * 3:
                raise ValueError("BMP pixel data truncated")
            for x in range(width):
                i = (y * width + x) * 3
                rgb[i] = line[x * 3 + 2]
                rgb[i + 1] = line[x * 3 + 1]
                rgb[i + 2] = line[x * 3]
        return {"format": "bmp", "width": width, "height": height,
                "rgb": bytes(rgb)}
    raise NotImplementedError(
        f"decode of media_type={media_type!r} requires codec libraries "
        "not present in this environment (pure-Python path covers PPM/"
        "BMP); decode_stub_features provides the byte-level stub"
    )


DECODED_SCHEMA = (
    "doc_id BIGINT, fmt STRING, width INT, height INT, "
    "n_px BIGINT, sum_r BIGINT, sum_g BIGINT, sum_b BIGINT"
)


def decode_image_features(media: DataFrame) -> DataFrame:
    """REAL decode feature extraction: parse each payload with
    real_decode and emit per-image dimensions + exact per-channel pixel
    sums. Integer-only output (means are computed engine-side from
    sum/count), so the result is exactly value-checkable against an
    analytic oracle. Arrow-batched narrow map, same shape as the stub
    path — the two differ only in what runs per batch."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in (
                    "doc_id", "fmt", "width", "height",
                    "n_px", "sum_r", "sum_g", "sum_b",
                )
            }
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                d = real_decode(bytes(payload), str(mt))
                rgb = d["rgb"]
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(d["format"])
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["n_px"].append(d["width"] * d["height"])
                out["sum_r"].append(sum(rgb[0::3]))
                out["sum_g"].append(sum(rgb[1::3]))
                out["sum_b"].append(sum(rgb[2::3]))
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, schema=DECODED_SCHEMA)


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


def make_synthetic_images(docs: DataFrame) -> DataFrame:
    """Deterministic image corpus keyed off doc_id: pixel (x, y)
    channel c has value (doc_id + x + y + c) % 256 in a (4 + id%5) x
    (3 + id%4) frame, written as real PPM (even ids) / BMP (odd ids)
    files. Every image is a pure function of doc_id, so an analytic
    oracle can verify the DECODED pixel statistics — any header/stride/
    channel-order parsing bug shows up as a value mismatch. Generation
    is a narrow Arrow-batched map after an explicit rebalance (single-
    file inputs scan as one partition)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "media_type": [], "payload": []
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 4 + doc_id % 5, 3 + doc_id % 4
                rgb = bytes(
                    (doc_id + x + y + c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                if doc_id % 2 == 0:
                    mt, payload = "image/ppm", encode_ppm(w, h, rgb)
                else:
                    mt, payload = "image/bmp", encode_bmp(w, h, rgb)
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    spread = docs.select("doc_id").repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col("doc_id")
    )
    return spread.mapInPandas(
        gen, schema="doc_id BIGINT, media_type STRING, payload BINARY"
    )


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
