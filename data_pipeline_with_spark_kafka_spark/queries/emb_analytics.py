"""Embedding-column analytics with an exact cross-engine oracle.

The dedup/ANN operators (operators/dedup.py, similarity.py) consume
embeddings; this query is the monitoring side: per-label vector counts,
centroid norm, mean vector norm, and within-label dispersion — the
numbers a training-data pipeline tracks to catch collapsed or drifting
embedding spaces.

Scale notes (100 TB design):
- the per-dimension centroid is a posexplode -> (label, dim) aggregate:
  map-side combinable, shuffle carries |labels| x 64 rows;
- the per-vector norm is a zero-shuffle F.aggregate lambda (JVM
  codegen, no UDF), reduced per label in the same pass;
- the two small aggregates join on label (|labels| rows).
- dispersion uses E||v - c||^2 = E||v||^2 - ||c||^2 — no second pass
  over the vectors against the centroid.

Float -> double casts happen BEFORE any arithmetic on both engines, so
per-vector sums are bit-identical; only cross-row averages need the
usual rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

EMB_CENTROID_ORACLE = """
WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
dims AS (
  SELECT label, i, AVG(embedding[i]::DOUBLE) AS c
  FROM embeddings, idx GROUP BY label, i
), centroid AS (
  SELECT label, SQRT(SUM(c * c)) AS centroid_norm FROM dims GROUP BY label
), pervec AS (
  SELECT label,
         CAST(COUNT(*) AS BIGINT) AS n_vectors,
         AVG(sq) AS avg_sq_norm,
         AVG(SQRT(sq)) AS avg_norm
  FROM (SELECT label,
               list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) AS sq
        FROM embeddings)
  GROUP BY label
)
SELECT p.label, p.n_vectors,
       ROUND(c.centroid_norm, 4) AS centroid_norm,
       ROUND(p.avg_norm, 4) AS avg_vector_norm,
       ROUND(p.avg_sq_norm - c.centroid_norm * c.centroid_norm, 4) AS dispersion
FROM pervec p JOIN centroid c USING (label)
"""


@register("emb_label_centroid_norms", oracle=EMB_CENTROID_ORACLE, tags=("llm", "embedding"))
def emb_label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-space health metrics: count, centroid L2
    norm, mean vector L2 norm, and dispersion E||v||^2 - ||c||^2."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    pervec = emb.select("label", sq.alias("sq")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.avg("sq").alias("avg_sq_norm"),
        F.avg(F.sqrt("sq")).alias("avg_norm"),
    )
    dims = (
        emb.select("label", F.posexplode("embedding").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
    )
    centroid = dims.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("centroid_norm")
    )
    return pervec.join(centroid, "label").select(
        "label",
        "n_vectors",
        round_to("centroid_norm", 4).alias("centroid_norm"),
        round_to("avg_norm", 4).alias("avg_vector_norm"),
        round_to(
            F.col("avg_sq_norm") - F.col("centroid_norm") * F.col("centroid_norm"), 4
        ).alias("dispersion"),
    )
