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


def fake_decode_features(df_with_media: DataFrame, id_col: str) -> DataFrame:
    """Deterministic stand-in decoder over ``mapInPandas``.

    Emits 4 'features' computed from the raw bytes (length, first byte,
    mean byte value, last byte) — shaped exactly like an image-embedding
    stage (Arrow-batched in, fixed-width float vector out).
    """
    flat = df_with_media.select(
        F.col(id_col).alias("doc_id"), F.col("media.data").alias("data")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = pdf["data"]
            feats = [
                [
                    float(len(b)),
                    float(b[0]) if len(b) else 0.0,
                    float(sum(b)) / len(b) if len(b) else 0.0,
                    float(b[-1]) if len(b) else 0.0,
                ]
                for b in raw
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in raw],
                    "features": feats,
                }
            )

    return flat.mapInPandas(batches, FEATURE_SCHEMA)
