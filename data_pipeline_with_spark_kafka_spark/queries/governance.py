"""Data-governance queries: k-anonymity audit and distribution drift.

Training-data pipelines ship with privacy and monitoring obligations:
- ``privacy_k_anonymity``: are there quasi-identifier combinations so
  rare they single people out? Classic k-anonymity over the
  (nation, segment) quasi-identifier pair: group sizes, flag groups
  below k, and report the suppression cost.
- ``drift_psi_labels``: population-stability-index drift between a
  reference and a current slice of the embeddings corpus — the number
  a model-quality dashboard alarms on when the ingest mix shifts.

Scale notes: both are one map-side-combinable aggregate over the fact
table plus joins between aggregate-sized relations (quasi-groups /
label distributions) — nothing corpus-sized shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

K_ANON = 20

K_ANONYMITY_ORACLE = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS group_size
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, group_size,
       group_size < {K_ANON} AS below_k,
       CASE WHEN group_size < {K_ANON} THEN group_size ELSE 0 END
         AS suppressed_rows
FROM g
"""


@register("privacy_k_anonymity", oracle=K_ANONYMITY_ORACLE, tags=("governance", "privacy"))
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the (nation, segment) quasi-identifier:
    per-group sizes, below-k flag, and the row count suppression would
    cost. One combinable aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    g = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    below = F.col("group_size") < K_ANON
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        below.alias("below_k"),
        F.when(below, F.col("group_size")).otherwise(F.lit(0)).cast("long").alias(
            "suppressed_rows"
        ),
    )


DRIFT_PSI_ORACLE = """
WITH ref AS (
  SELECT label, COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER () AS p
  FROM embeddings WHERE vec_id % 2 = 0 GROUP BY label
), cur AS (
  SELECT label, COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER () AS q
  FROM embeddings WHERE vec_id % 2 = 1 GROUP BY label
)
SELECT r.label, ROUND(r.p, 6) AS ref_share, ROUND(c.q, 6) AS cur_share,
       ROUND((c.q - r.p) * LN(c.q / r.p), 6) AS psi_term
FROM ref r JOIN cur c USING (label)
"""


@register("drift_psi_labels", oracle=DRIFT_PSI_ORACLE, tags=("governance", "monitoring"))
def drift_psi_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index terms per label between the even-id
    (reference) and odd-id (current) halves of the embeddings corpus.
    Two label-sized aggregates joined on label; the total PSI is the
    sum of psi_term downstream."""
    emb = load_table(spark, sf_dir, "embeddings")

    def share(pred, name):
        counts = emb.filter(pred).groupBy("label").agg(F.count(F.lit(1)).alias("n"))
        # global-total window over the LABEL-SIZED aggregate (10 rows),
        # not over the corpus — the single partition is fine there.
        total = F.sum("n").over(Window.partitionBy())
        return counts.select("label", (F.col("n") / total).alias(name))

    ref = share(F.col("vec_id") % 2 == 0, "p")
    cur = share(F.col("vec_id") % 2 == 1, "q")
    return ref.join(cur, "label").select(
        "label",
        round_to("p", 6).alias("ref_share"),
        round_to("q", 6).alias("cur_share"),
        round_to((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p")), 6).alias(
            "psi_term"
        ),
    )
