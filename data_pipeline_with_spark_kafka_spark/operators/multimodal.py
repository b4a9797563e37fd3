"""Multimodal column convention + processing plumbing.

Convention: media travels as an opaque ``binary`` column alongside a typed
metadata struct —

    media: struct<uri: string, media_type: string, data: binary,
                  meta: map<string,string>>

Metadata-only operations (routing, size stats, hashing, filtering) stay
fully relational (codegen). Decode/feature-extraction crosses into Python
via ``mapInPandas`` (Arrow-batched — never row-at-a-time py4j), with the
actual codec calls stubbed: image/audio libraries are not in this
environment, so ``decode_media`` raises NotImplementedError while
``fake_decode_features`` provides a deterministic stand-in that keeps the
schema, batching, and partitioning contracts real and testable.

At 100 TB: blobs dominate row size — repartition by target partition size
BEFORE any wide op so a single task's Arrow batches stay in memory;
``spark.sql.files.maxPartitionBytes`` governs the scan side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build the media struct from a text column (stand-in for real media
    bytes; the engine-side contract is identical for jpeg/wav/mp4 blobs)."""
    return df.select(
        F.col(id_col),
        F.struct(
            F.concat(F.lit("mem://doc/"), F.col(id_col).cast("string")).alias("uri"),
            F.lit("text/plain").alias("media_type"),
            F.encode(F.col(text_col), "UTF-8").alias("data"),
            F.create_map(F.lit("origin"), F.lit("fixture")).alias("meta"),
        ).alias("media"),
    )


def blob_metadata(df_with_media: DataFrame, id_col: str) -> DataFrame:
    """Relational metadata extraction — no Python, no decode."""
    return df_with_media.select(
        F.col(id_col),
        F.col("media.uri").alias("uri"),
        F.col("media.media_type").alias("media_type"),
        F.length(F.col("media.data")).alias("n_bytes"),
        F.sha2(F.col("media.data"), 256).alias("content_sha256"),
    )


def decode_media(*_args, **_kwargs):
    """Real media decode (PIL / torchaudio / pyav). Not available in this
    environment — the Spark-side plumbing is exercised through
    ``fake_decode_features`` instead."""
    raise NotImplementedError(
        "media codecs are not installed; use fake_decode_features for the "
        "pipeline plumbing, or plug a real decoder into extract_features()"
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def fake_resize(df_with_media: DataFrame, id_col: str, *, width: int = 8, height: int = 8) -> DataFrame:
    """Resize stand-in over ``mapInPandas``: deterministic stride-sampling
    of the raw bytes down to width*height 'pixels'. A real implementation
    swaps the inner function for PIL/opencv; the Spark contract (Arrow
    batches in, fixed-shape binary out) is identical."""
    flat = df_with_media.select(F.col(id_col).alias("doc_id"), F.col("media.data").alias("data"))
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pixels = []
            for b in pdf["data"]:
                if len(b) == 0:
                    pixels.append(bytes(target))
                    continue
                step = max(len(b) // target, 1)
                sampled = bytes(b[min(i * step, len(b) - 1)] for i in range(target))
                pixels.append(sampled)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": pixels,
                }
            )

    return flat.mapInPandas(batches, RESIZE_SCHEMA)


def fake_frame_sample(df_with_media: DataFrame, id_col: str, *, frame_bytes: int = 16, every_n: int = 4) -> DataFrame:
    """Frame-sampling stand-in: treat the blob as a 'video' of fixed-size
    frames, emit every n-th frame as its own row (one-to-many mapInPandas —
    the same shape as real video keyframe extraction)."""
    flat = df_with_media.select(F.col(id_col).alias("doc_id"), F.col("media.data").alias("data"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["data"]):
                n_frames = max(len(b) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(bytes(b[fi * frame_bytes : (fi + 1) * frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return flat.mapInPandas(batches, FRAME_SCHEMA)


def fake_decode_features(df_with_media: DataFrame, id_col: str) -> DataFrame:
    """Deterministic stand-in decoder over ``mapInPandas``.

    Emits 4 'features' computed from the raw bytes (length, first byte,
    mean byte value, last byte) — shaped exactly like an image-embedding
    stage (Arrow-batched in, fixed-width float vector out).
    """
    flat = df_with_media.select(
        F.col(id_col).alias("doc_id"), F.col("media.data").alias("data")
    )

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = pdf["data"]
            feats = []
            for b in raw:
                if not len(b):
                    feats.append([0.0, 0.0, 0.0, 0.0])
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                # vectorized byte stats (a per-byte Python loop here costs
                # ~2s at sf0.1; frombuffer+mean is ~free)
                feats.append([float(arr.size), float(arr[0]), float(arr.mean()), float(arr[-1])])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in raw],
                    "features": feats,
                }
            )

    return flat.mapInPandas(batches, FEATURE_SCHEMA)
