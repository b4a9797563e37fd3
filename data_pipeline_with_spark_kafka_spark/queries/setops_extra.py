"""Remaining set-op variants: INTERSECT ALL and union-by-name with missing
columns (SURVEY.md §2.6 [EXT] completion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table


@register(
    "setop_intersect_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiplicity-preserving intersection)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return a.intersectAll(b)


@register(
    "setop_union_by_name_missing",
    oracle="""
SELECT r_name AS name, r_regionkey AS region_key, NULL AS nation_key FROM region
UNION ALL BY NAME
SELECT n_name AS name, n_regionkey AS region_key, n_nationkey AS nation_key FROM nation
""",
    tags=("setop",),
)
def setop_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-aligned union where one
    side lacks a column (filled with NULL)."""
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.col("r_regionkey").alias("region_key")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("region_key"),
        F.col("n_nationkey").alias("nation_key"),
    )
    return region.unionByName(nation, allowMissingColumns=True)
