"""Last TPC-H shapes: max-over-aggregate selection (Q15) and
double-correlated EXISTS / NOT EXISTS against the same fact (Q21,
adapted to this schema's columns: shipdate stands in for the
receipt/commit pair)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

Q15_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("tpch_q15_top_supplier", oracle=Q15_ORACLE, tags=("tpch", "subquery"))
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: select the row(s) achieving the max of an aggregated relation
    (aggregate once, broadcast the 1-row max, equi-filter). Comparing on the
    ROUNDED revenue keeps the max-equality stable across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        round_to(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        supp.join(revenue, supp["s_suppkey"] == revenue["supplier_no"])
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q21_ORACLE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
"""


@register("tpch_q21_waiting_supplier", oracle=Q21_ORACLE, tags=("tpch", "subquery"))
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: per-row EXISTS (another supplier on the order) AND
    NOT EXISTS (another supplier shipping later) — expressed as left-semi
    then left-anti joins against aliased scans of the same fact."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")

    l1 = li.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_suppkey").alias("s1"),
        F.col("l_shipdate").alias("d1"),
        F.col("l_linenumber").alias("n1"),
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )

    semi = l1.join(l2, (F.col("k2") == F.col("k1")) & (F.col("s2") != F.col("s1")), "left_semi")
    anti = semi.join(
        l3,
        (F.col("k3") == F.col("k1"))
        & (F.col("s3") != F.col("s1"))
        & (F.col("d3") > F.col("d1")),
        "left_anti",
    )
    return (
        anti.join(orders, F.col("k1") == orders["o_orderkey"])
        .join(supp, F.col("s1") == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
