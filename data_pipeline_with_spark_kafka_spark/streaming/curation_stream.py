"""Streaming corpus curation: the batch curation transforms lifted onto a
document STREAM (the shape of a continuously-ingesting training-data
pipeline: crawler output lands on a bus, the curated corpus accretes).

Everything per-row (quality scoring, PII redaction, split assignment) is a
stateless codegen expression, so it lifts to Structured Streaming
unchanged — the same operators the batch `curate` CLI composes. The one
genuinely stateful step is exact dedup: batch dedup group-bys the whole
corpus, a stream instead carries a bounded dedup state via
``dropDuplicatesWithinWatermark`` on the content fingerprint — duplicates
arriving within the watermark horizon are dropped exactly; a duplicate
arriving later than the horizon is the (documented) trade every streaming
dedup makes to bound state. Downstream, the keyed-upsert sink keyed on the
fingerprint converges replays AND late duplicates to one row per content.

At scale: state is partitioned by fingerprint hash across executors;
the watermark horizon bounds per-key state lifetime, so state size ~
(ingest rate x horizon), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.operators.curation import redact_pii
from data_pipeline_with_spark_kafka_spark.operators.text import quality_score, tokens


def curate_document_stream(
    stream: DataFrame,
    *,
    ts_col: str = "ingest_ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    watermark: str = "10 minutes",
    split_seed: str = "split42",
) -> DataFrame:
    """Streaming analog of ``operators.curation.curate_corpus``:
    watermarked fingerprint dedup -> quality floor -> PII redaction ->
    deterministic split. Returns a streaming DataFrame of
    (id, lang, split, quality, fingerprint, redacted text)."""
    quality = quality_score(F.col(text_col), tokens(F.col(text_col)))
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{split_seed}:"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .withColumn("fingerprint", F.md5(F.col(text_col)))
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .withColumn("quality", round_to(quality, 4))
        .filter(F.col("quality") >= min_quality)
        .select(
            id_col,
            "lang",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
            "quality",
            "fingerprint",
            redact_pii(F.col(text_col)).alias(text_col),
        )
    )
