"""Multimodal column support (SURVEY §2.11 X6): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (or ``NotImplementedError`` in strict
mode); the Spark-side plumbing — schema, partition sizing, UDF
signatures, batch shapes — is real and tested. Swapping in a real
decoder (PIL/ffmpeg) changes only ``_decode_fake``.

Scale notes: binary payloads dominate partition size, so media tables
must be read with a small ``spark.sql.files.maxPartitionBytes`` (or
repartitioned by byte budget) to keep Arrow batches within executor
memory; metadata-only plans never touch the payload column thanks to
parquet column pruning.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed media schema: payload + metadata. Metadata mirrors what a real
# decoder would emit; queries should predicate on metadata so the binary
# column prunes out of the scan.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)

# strict=True -> decode raises NotImplementedError instead of faking.
# Passed as a function argument (captured by value into the mapInPandas
# closure) because a module global would not propagate to executor
# worker processes.


def synthesize_media(spark, n: int = 64, kind: str = "image", payload_bytes: int = 1024) -> DataFrame:
    """Deterministic fake media table (seeded by media_id) used by tests —
    stands in for a real binary ingest (S3/webdataset/tar shards)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{kind}-{i}".encode()).digest() * (payload_bytes // 32 + 1)
        rows.append(
            (
                i,
                kind,
                bytearray(payload[:payload_bytes]),
                f"{kind}/fake",
                64 + (i % 8) * 16 if kind == "image" else None,
                64 + (i % 5) * 16 if kind == "image" else None,
                1000 * (i % 30 + 1) if kind in ("audio", "video") else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_fake(payload: bytes, dim: int = 8, strict: bool = False) -> list[float]:
    """STUB DECODER — deterministic fake in place of PIL/librosa/ffmpeg.

    Real implementation would decode pixels/samples and pool features.
    Here: crc32-seeded pseudo-features so tests are reproducible.
    """
    if strict:
        raise NotImplementedError("media codecs not available in this container")
    if payload is None:
        return []
    crc = zlib.crc32(bytes(payload))
    return [((crc >> (4 * j)) & 0xF) / 15.0 for j in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 8, strict: bool = False, algo: str = "sha1"
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The iterator-of-batches shape is the real production plumbing: one
    Python worker per partition, Arrow transfer, constant memory per
    batch regardless of corpus size. ``algo`` picks the payload digest
    (any hashlib algorithm name).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [_decode_fake(p, dim, strict) for p in pdf["payload"]],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "digest": [
                        hashlib.new(algo, bytes(p)).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, strict: bool = False) -> DataFrame:
    """Resize stage (stubbed decode): metadata updated natively, payload
    passed through the fake 'resampler'. Filter+metadata edits stay
    JVM-side; only the payload rewrite crosses to Python."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("media codecs not available in this container")
            # Fake resample: truncate/pad payload proportionally to area ratio.
            out = pdf.copy()
            out["payload"] = [
                None if p is None else bytes(p)[: max(32, width * height // 64)]
                for p in pdf["payload"]
            ]
            out["width"] = width
            out["height"] = height
            yield out

    return media.where(F.col("kind") == "image").mapInPandas(fn, media.schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (flatMap
    shape). Frame payload is stub-decoded; the row-explosion plumbing and
    schema are production-true."""
    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if strict:
                raise NotImplementedError("media codecs not available in this container")
            # Vectorized row explosion: frames-per-row via ceil(dur/step),
            # then np.repeat for the parent columns and a concatenated
            # arange for the per-frame index — no per-row python loop.
            dur = pdf["duration_ms"].fillna(0).astype("int64").to_numpy()
            n = np.ceil(dur / every_ms).astype("int64").clip(min=0)
            idxs = (
                np.concatenate([np.arange(k) for k in n])
                if len(n) and n.sum()
                else np.array([], dtype="int64")
            )
            stubs = [
                None if p is None else bytes(p)[:64] for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), n),
                    "frame_idx": idxs.astype("int32"),
                    "ts_ms": idxs * every_ms,
                    "frame": np.repeat(
                        np.asarray(stubs, dtype=object), n
                    ),
                }
            )

    return media.where(F.col("kind") == "video").mapInPandas(fn, frame_schema)
