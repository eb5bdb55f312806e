"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches.

The container has no image/audio codecs, so the *decode* step is
stubbed (deterministic synthetic payload format XMED1; real decoders
are gated behind import-try and raise ``NotImplementedError``), while
everything Spark-side is real and tested: schemas, batch shapes,
``mapInPandas`` signatures, partitioning, and a genuine feature
extractor (byte-histogram embedding) that needs no codec.

Payload format (synthetic): b"XMED1" + kind(1B: I/A/V) + width(2B) +
height(2B) + n_frames(2B) + body bytes (seeded).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MAGIC = b"XMED1"
KINDS = {"I": "image", "A": "audio", "V": "video"}

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), False),
])

META_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("n_bytes", IntegerType(), False),
    StructField("valid", StringType(), False),
])


def encode_media(media_id: int, kind: str, width: int, height: int,
                 n_frames: int, seed: int = 42) -> bytes:
    rng = np.random.default_rng(seed * 1_000_003 + media_id)
    body = rng.integers(0, 256, size=width * height // 16,
                        dtype=np.uint8).tobytes()
    k = {v: k for k, v in KINDS.items()}[kind]
    return (MAGIC + k.encode()
            + struct.pack(">HHH", width, height, n_frames) + body)


def media_corpus(spark: SparkSession, n: int, seed: int = 42,
                 partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table, generated distributed."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                w, h = 64 + (i % 8) * 16, 64 + (i % 5) * 16
                frames = 1 if kind == "image" else 8 + i % 24
                ids.append(i)
                kinds.append(kind)
                payloads.append(encode_media(i, kind, w, h, frames, seed))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads})

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def parse_meta(payload: bytes) -> dict:
    """Decode the typed header (the deterministic stand-in for probing
    a real container format)."""
    if payload[:5] != MAGIC or len(payload) < 12:
        return {"kind": None, "width": None, "height": None,
                "n_frames": None, "valid": "corrupt"}
    kind = KINDS.get(chr(payload[5]))
    w, h, f = struct.unpack(">HHH", payload[6:12])
    return {"kind": kind, "width": w, "height": h, "n_frames": f,
            "valid": "ok"}


def extract_metadata(media: DataFrame) -> DataFrame:
    """payload → typed metadata columns (Arrow-batched, no shuffle)."""
    src = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload)
                meta = parse_meta(payload)
                rows.append({
                    "media_id": int(mid),
                    "kind": kind,
                    "width": meta["width"],
                    "height": meta["height"],
                    "n_frames": meta["n_frames"],
                    "n_bytes": len(payload),
                    "valid": meta["valid"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              META_SCHEMA.fields])

    return src.mapInPandas(run, META_SCHEMA)


FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("feature", ArrayType(FloatType()), False),
])


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Codec-free feature extraction: normalized byte histogram of the
    body — a real, deterministic embedding usable by the similarity
    operators (``operators.similarity``)."""
    src = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = np.frombuffer(bytes(payload)[12:], dtype=np.uint8)
                if body.size == 0:
                    hist = np.zeros(bins, dtype=np.float32)
                else:
                    hist = np.bincount(body >> 4, minlength=bins)[:bins]
                    hist = (hist / hist.sum()).astype(np.float32)
                ids.append(int(mid))
                feats.append(hist.tolist())
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return src.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(media: DataFrame, scale_num: int = 1,
                 scale_den: int = 2) -> DataFrame:
    """Resize stage: emits payloads with scaled dimensions and a
    deterministically downsampled body (every ``scale_den``-th byte of
    every ``scale_num``) — the Spark-side shape of a real resize (a
    codec would produce resampled pixels here; the header arithmetic,
    schema, and batch plumbing are the real thing)."""
    src = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one output frame PER input batch — never buffer the whole
        # partition's binaries in memory
        for pdf in batches:
            rows = {"media_id": [], "kind": [], "payload": []}
            for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload)
                meta = parse_meta(payload)
                if meta["valid"] != "ok":
                    # corrupt payloads pass through untouched (nothing
                    # is silently dropped; metadata stage flags them)
                    rows["media_id"].append(int(mid))
                    rows["kind"].append(kind)
                    rows["payload"].append(payload)
                    continue
                # header fields are uint16 — clamp upscales
                w = min(65535, max(1, meta["width"] * scale_num // scale_den))
                h = min(65535, max(1, meta["height"] * scale_num // scale_den))
                body = payload[12:]
                stride = max(1, scale_den // max(1, scale_num))
                new_body = body[::stride]
                k = {v: kk for kk, v in KINDS.items()}[meta["kind"]]
                rows["media_id"].append(int(mid))
                rows["kind"].append(kind)
                rows["payload"].append(
                    MAGIC + k.encode()
                    + struct.pack(">HHH", w, h, meta["n_frames"])
                    + new_body)
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return src.mapInPandas(run, MEDIA_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), False),
])


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video payloads: slice the body into n_frames
    segments, keep every ``every_n``-th (real slicing over the synthetic
    container; a real decoder would produce pixel buffers here)."""
    src = media.filter(F.col("kind") == "video").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                meta = parse_meta(payload)
                if meta["valid"] != "ok" or not meta["n_frames"]:
                    continue
                body = payload[12:]
                n = meta["n_frames"]
                size = max(1, len(body) // n)
                for idx in range(0, n, every_n):
                    rows.append({
                        "media_id": int(mid),
                        "frame_idx": idx,
                        "frame": body[idx * size:(idx + 1) * size],
                    })
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame"])

    return src.mapInPandas(run, FRAME_SCHEMA)


def decode_image(payload: bytes):
    """Real image decode — requires a codec the sandbox doesn't ship.
    Clearly-marked stub per the build contract."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow; the Spark-side plumbing "
            "(schema, batching, partitioning) is real — swap this stub "
            "for Image.open(io.BytesIO(payload)) in a full environment"
        ) from e
    raise NotImplementedError("real decode path intentionally stubbed")
