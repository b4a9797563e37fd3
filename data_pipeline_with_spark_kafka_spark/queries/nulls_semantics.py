"""NULL-semantics corpus: the fixtures carry no NULLs, so this query
manufactures them (NULLIF) and pins down the cross-engine contract —
aggregates skip NULLs, COUNT(*) does not, NULL grouping keys form their
own group, arithmetic with NULL is NULL, COALESCE fills."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

NULLS_ORACLE = """
WITH o AS (
    SELECT NULLIF(o_orderstatus, 'P') AS status_nullable,
           CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END AS price_nullable,
           o_totalprice
    FROM orders
)
SELECT status_nullable,
       COUNT(*) AS n_rows,
       COUNT(price_nullable) AS n_priced,
       ROUND(SUM(price_nullable), 4) AS sum_priced,
       ROUND(AVG(price_nullable), 4) AS avg_priced,
       ROUND(SUM(COALESCE(price_nullable, 0.0)), 4) AS sum_coalesced,
       ROUND(MAX(price_nullable + 0.0), 4) AS max_arith,
       CAST(SUM(CASE WHEN price_nullable IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_priced
FROM o
GROUP BY status_nullable
"""


@register("nulls_semantics", oracle=NULLS_ORACLE, tags=("nulls", "agg"))
def nulls_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL grouping keys + NULL-skipping aggregates + NULL arithmetic."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_nullable"),
        F.when(F.col("o_totalprice") < 50000, None)
        .otherwise(F.col("o_totalprice"))
        .alias("price_nullable"),
    )
    return o.groupBy("status_nullable").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("price_nullable").alias("n_priced"),
        round_to(F.sum("price_nullable"), 4).alias("sum_priced"),
        round_to(F.avg("price_nullable"), 4).alias("avg_priced"),
        round_to(F.sum(F.coalesce("price_nullable", F.lit(0.0))), 4).alias("sum_coalesced"),
        round_to(F.max(F.col("price_nullable") + 0.0), 4).alias("max_arith"),
        F.sum(F.when(F.col("price_nullable").isNull(), 1).otherwise(0)).alias("n_null_priced"),
    )


NULLSAFE_JOIN_ORACLE = """
WITH a AS (
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS k FROM orders WHERE o_orderkey % 5 = 0
), b AS (
    SELECT NULLIF(o_orderstatus, 'P') AS k, COUNT(*) AS n_side
    FROM orders GROUP BY 1
)
SELECT a.o_orderkey, a.k, b.n_side
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


@register("join_null_safe_equality", oracle=NULLSAFE_JOIN_ORACLE, tags=("join", "nulls"))
def join_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of dropping — the semantics CDC reconciliation and
    late-dimension joins need. Still a hash-shuffleable equi-join (the
    null-safe comparator is a join key, not a residual filter)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k")
    )
    b = orders.groupBy(F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k")).agg(
        F.count(F.lit(1)).alias("n_side")
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(a["o_orderkey"], a["k"], b["n_side"])
