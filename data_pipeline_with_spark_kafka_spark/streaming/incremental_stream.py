"""Streaming incremental dedup: a document stream admitted against a
STATIC curated corpus (the continuous form of
``operators/incremental.incremental_novel`` — crawler output lands on a
bus; only content the corpus has never seen flows through).

Two dedup layers, each bounded:

- **vs the static corpus** — Structured Streaming supports stream-static
  LEFT OUTER with the static side on the right, so the anti-join is
  expressed as left-outer against the corpus *fingerprint* relation +
  null filter (stream-static ``left_anti`` itself is unsupported). The
  static side is a narrow (fp, fp2) relation, re-read per micro-batch;
  at scale it is the corpus fingerprint index, not the corpus.
- **within the stream** — ``dropDuplicatesWithinWatermark`` on the
  fingerprint: state is bounded by (ingest rate × watermark horizon),
  independent of corpus size (same trade documented in
  curation_stream.py).

No UDFs; fingerprints are the same 128-bit seeded-xxhash64 pair the batch
operator uses, so batch and stream agree on what "same content" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def novel_document_stream(
    stream: DataFrame,
    known: DataFrame,
    *,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Rows of the document ``stream`` whose content is not in the static
    ``known`` corpus and not seen earlier in the stream (within the
    watermark horizon). Preserves the stream's columns."""
    if not stream.isStreaming:
        raise ValueError("stream must be a streaming DataFrame")
    if known.isStreaming:
        raise ValueError("known must be a static DataFrame (the curated corpus)")

    c = F.col(text_col)
    known_fp = (
        known.select(
            F.xxhash64(F.col(text_col)).alias("fp"),
            F.xxhash64(F.col(text_col), F.lit(1)).alias("fp2"),
        )
        .distinct()
        .withColumn("_known", F.lit(1))
    )
    tagged = stream.withColumn("fp", F.xxhash64(c)).withColumn("fp2", F.xxhash64(c, F.lit(1)))
    return (
        tagged.withWatermark(ts_col, watermark)
        .join(known_fp, ["fp", "fp2"], "left")
        .filter(F.col("_known").isNull())
        .drop("_known")
        .dropDuplicatesWithinWatermark(["fp", "fp2"])
        .drop("fp", "fp2")
    )
