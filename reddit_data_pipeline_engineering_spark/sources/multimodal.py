"""Multimodal asset columns: image/audio/video as opaque binary + typed
metadata (engine extension; the reference is text/numeric only).

Design for 100 TB of mixed-media training data:
- assets are rows of ``schemas.MULTIMODAL_ASSET``: a ``binary`` payload
  column plus typed metadata (modality, mime, dims, duration) so filters
  and partition pruning never touch payload bytes;
- payloads stay OUT of shuffle keys; pipelines group/filter on metadata and
  only stream payload bytes through Arrow-batched ``mapInPandas`` stages;
- decode / feature-extract / resize / frame-sample are ``mapInPandas``
  generators: per-batch pandas in, per-batch pandas out, so Python cost is
  amortized over Arrow batches (never row-at-a-time UDFs).

Codec status: container parsing for WAV (RIFF chunk walk) and binary PPM
(P6 header) is REAL — ``probe_media``/``probe_assets`` read genuine
headers, PCM layout, and durations with the standard library only.
Compressed codecs (JPEG/PNG/H.264/MP3) are the stubbed part:
``decode_payload`` understands the engine's deterministic synthetic
payload format and raises ``NotImplementedError`` for anything needing a
real decompressor, since those libraries are not in this environment. The
Spark-side plumbing — schemas, batch iteration, partitioning behavior —
is real and tested either way.
"""

from __future__ import annotations

import struct
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.cloudpickle import register_pickle_by_value
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_data_pipeline_engineering_spark.schemas import MULTIMODAL_ASSET

# Synthetic payload layout: magic(4s) | width(i) | height(i) | then
# width*height pseudo-pixel bytes generated from the asset id.
# struct-module functions only (no module-level struct.Struct: Struct
# instances don't pickle, and this module ships by value to workers).
_MAGIC = b"FAKE"
_HEADER_FMT = "<4sii"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def encode_payload(width: int, height: int, pixels: bytes) -> bytes:
    """Pack pixels into the synthetic payload format."""
    return struct.pack(_HEADER_FMT, _MAGIC, width, height) + pixels


def synth_payload(asset_id: int, width: int, height: int) -> bytes:
    """Deterministic fake media payload (stands in for JPEG/WAV bytes)."""
    body = bytes(
        (asset_id * 31 + i * 7) % 256 for i in range(width * height)
    )
    return encode_payload(width, height, body)


def synthesize_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic asset table for tests/demos (schema-contract rows)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        w, h = 8 + (i % 5), 6 + (i % 4)
        rows.append(
            (
                i,
                modality,
                synth_payload(i, w, h),
                {"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}[
                    modality
                ],
                w,
                h,
                1000 * (i % 30) if modality != "image" else None,
                {"source": f"synth{i % 4}"},
            )
        )
    return spark.createDataFrame(rows, MULTIMODAL_ASSET)


def decode_payload(payload: bytes) -> tuple[int, int, bytes]:
    """Decode one synthetic payload -> (width, height, pixels).

    Real decoders (PIL/libav/...) are not installed in this environment;
    anything that is not the synthetic format raises NotImplementedError —
    swap this function for a real codec in production.
    """
    if payload is None or len(payload) < _HEADER_SIZE:
        raise NotImplementedError("real media decoding not available (stub)")
    magic, w, h = struct.unpack_from(_HEADER_FMT, payload)
    if magic != _MAGIC:
        raise NotImplementedError("real media decoding not available (stub)")
    return w, h, payload[_HEADER_SIZE : _HEADER_SIZE + w * h]


# --------------------------------------------------------------------------
# Real container probing — no media libraries required. WAV (RIFF chunks)
# and binary PPM (P6) are parseable with the standard library alone, so
# these are NOT stubbed: the engine reads real headers and PCM/pixel
# dimensions. Only compressed codecs (JPEG/PNG/H.264/MP3...) remain behind
# NotImplementedError, because their decoders aren't in this environment.
# --------------------------------------------------------------------------


def _probe_wav(payload: bytes) -> dict:
    """Parse RIFF/WAVE chunks: fmt (channels/rate/bits) + data size."""
    out = {"container": "wav"}
    pos = 12  # 'RIFF' size 'WAVE'
    n_channels = sample_rate = bits = data_size = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<i", payload, pos + 4)
        if cid == b"fmt " and pos + 24 <= len(payload):
            _, n_channels, sample_rate = struct.unpack_from(
                "<hhi", payload, pos + 8
            )
            (bits,) = struct.unpack_from("<h", payload, pos + 22)
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if n_channels and sample_rate and bits and data_size is not None:
        frame_bytes = n_channels * (bits // 8)
        n_samples = data_size // frame_bytes if frame_bytes else 0
        out.update(
            n_channels=n_channels,
            sample_rate_hz=sample_rate,
            n_samples=n_samples,
            duration_ms=int(n_samples * 1000 / sample_rate),
        )
    return out


def _probe_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6) header: 'P6' <width> <height> <maxval>."""
    fields: list[int] = []
    pos = 2
    while len(fields) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(payload[start:pos]))
        else:
            break
    out = {"container": "ppm"}
    if len(fields) == 3:
        out.update(width=fields[0], height=fields[1])
    return out


def probe_media(payload: bytes) -> dict:
    """Container-level probe: format + dimensions/PCM layout, no decode.

    Returns a dict with ``container`` plus whichever of width/height/
    n_channels/sample_rate_hz/n_samples/duration_ms the format carries.
    Unknown magics probe as ``unknown`` rather than raising — probing is a
    profiling pass, not a decode.
    """
    if payload is None or len(payload) < 12:
        return {"container": "unknown"}
    if payload[:4] == _MAGIC:
        _, w, h = struct.unpack_from(_HEADER_FMT, payload)
        return {"container": "synthetic", "width": w, "height": h}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _probe_wav(payload)
    if payload[:2] == b"P6":
        return _probe_ppm(payload)
    return {"container": "unknown"}


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("container", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate_hz", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def probe_assets(df: DataFrame) -> DataFrame:
    """Probe every payload's container/shape via Arrow-batched mapInPandas
    (same batch plumbing as decode_assets; payload bytes never shuffle)."""

    cols = [f.name for f in PROBE_SCHEMA.fields]

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                info = probe_media(payload)
                rows.append({"asset_id": int(aid), **info})
            out = pd.DataFrame(rows)
            for c in cols:
                if c not in out.columns:
                    out[c] = None
            yield out[cols]

    return df.select("asset_id", "payload").mapInPandas(
        probe_batches, PROBE_SCHEMA
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
    ]
)


def decode_assets(df: DataFrame) -> DataFrame:
    """Decode payloads to per-asset stats via Arrow-batched mapInPandas.

    The generator shape (iterator of pandas batches) is the production
    pattern: payload bytes flow through Arrow once, Python work is
    vectorizable per batch, and no driver collection happens.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, pixels = decode_payload(payload)
                out.append(
                    {
                        "asset_id": int(aid),
                        "width": w,
                        "height": h,
                        "n_bytes": len(pixels),
                        "mean_intensity": (sum(pixels) / len(pixels))
                        if pixels
                        else None,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return df.select("asset_id", "payload").mapInPandas(
        decode_batches, DECODED_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_assets(df: DataFrame, new_width: int, new_height: int) -> DataFrame:
    """Nearest-neighbor 'resize' over synthetic payloads (mapInPandas).

    Real resampling is the stubbed part; the batch plumbing and the
    payload-in/payload-out schema contract are the real deliverable.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, pixels = decode_payload(payload)
                resized = bytes(
                    pixels[
                        min(int(y * h / new_height), h - 1) * w
                        + min(int(x * w / new_width), w - 1)
                    ]
                    for y in range(new_height)
                    for x in range(new_width)
                )
                rows.append(
                    {
                        "asset_id": int(aid),
                        "width": new_width,
                        "height": new_height,
                        "payload": encode_payload(new_width, new_height, resized),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return df.select("asset_id", "payload").mapInPandas(
        resize_batches, RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.LongType(), True),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plan for video/audio assets: one output row per
    sampled frame timestamp (metadata-only here — the decode of actual
    frames is the stubbed codec part)."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, dur in zip(pdf["asset_id"], pdf["duration_ms"]):
                if pd.isna(dur):
                    continue
                for idx, ms in enumerate(range(0, int(dur) + 1, every_ms)):
                    rows.append(
                        {"asset_id": int(aid), "frame_idx": idx, "frame_ms": ms}
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return (
        df.filter(F.col("modality").isin("video", "audio"))
        .select("asset_id", "duration_ms")
        .mapInPandas(frame_batches, FRAMES_SCHEMA)
    )


# The mapInPandas generators above close over module-level helpers
# (decode_payload / encode_payload). By default cloudpickle serializes
# those by REFERENCE (module + qualname), which breaks on executors whose
# Python workers don't have this repo on sys.path (e.g. a driver started
# from another cwd). Registering the module forces by-value serialization
# of its functions into the closure, making the UDFs self-contained.
register_pickle_by_value(sys.modules[__name__])
