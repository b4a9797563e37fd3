"""Second TPC-H wave: shapes the first wave doesn't cover — outer-join
group counts including empty groups (Q13), conditional aggregation (Q14),
group-HAVING semi-join (Q18), disjunctive multi-column pushdown (Q19).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

Q13_ORACLE = """
WITH per_customer AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_customer
GROUP BY c_count
"""


@register("tpch_q13_customer_distribution", oracle=Q13_ORACLE, tags=("tpch", "join", "agg"))
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation over a filtered LEFT join — COUNT of
    a nullable column keeps zero-order customers (count(col) skips nulls)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_customer = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_customer.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q14_ORACLE = """
SELECT ROUND(100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


@register("tpch_q14_promo_effect", oracle=Q14_ORACLE, tags=("tpch", "agg"))
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation ratio over a part join
    (AQE-elected strategy; part is sf-proportional)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            round_to(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


Q18_ORACLE = """
WITH big AS (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 120
)
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
       ROUND(o.o_totalprice, 4) AS total_price,
       ROUND(s.qty, 4) AS total_qty
FROM orders o
JOIN (SELECT l_orderkey, SUM(l_quantity) AS qty FROM lineitem GROUP BY l_orderkey) s
  ON s.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


@register("tpch_q18_large_volume", oracle=Q18_ORACLE, tags=("tpch", "join", "topk"))
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-derived key set drives a semi-filter on orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sums = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    big = sums.filter(F.col("qty") > 120).select("l_orderkey")
    return (
        orders.join(sums, orders["o_orderkey"] == sums["l_orderkey"])
        .join(big.withColumnRenamed("l_orderkey", "big_key"), F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            round_to("o_totalprice", 4).alias("total_price"),
            round_to("qty", 4).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


Q19_ORACLE = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity >= 5 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 5 AND 20 AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_type = 'PROMO' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1 AND l.l_quantity <= 15)
"""


@register("tpch_q19_discounted_revenue", oracle=Q19_ORACLE, tags=("tpch", "filter", "join"))
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate across both join sides (tests that
    Catalyst still extracts the common join key and per-side filters)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & q.between(5, 20))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(5, 20) & q.between(10, 30))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 15) & q.between(1, 15))
    )
    return joined.filter(cond).agg(
        round_to(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
