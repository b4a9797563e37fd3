"""Third TPC-H wave: the subquery shapes — decorrelated per-group min (Q2),
EXISTS (Q4), conditional bucketing (Q12), distinct-count grouping (Q16),
correlated scalar average (Q17), anti-join + global scalar (Q22).

Expressed the scalable way: every correlated subquery becomes a join
against a (broadcast) aggregated relation — exactly what Catalyst's
decorrelation rewrites produce, stated explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

Q2_ORACLE = """
WITH costs AS (
    SELECT l_partkey, MIN(l_extendedprice / l_quantity) AS min_unit_cost
    FROM lineitem GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name,
       ROUND(c.min_unit_cost, 4) AS min_unit_cost
FROM part p
JOIN costs c ON c.l_partkey = p.p_partkey
WHERE p.p_size >= 20
"""


@register("tpch_q2_min_cost_per_part", oracle=Q2_ORACLE, tags=("tpch", "subquery"))
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-group MIN subquery decorrelated into an aggregate+join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    costs = li.groupBy("l_partkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit_cost")
    )
    return (
        part.join(costs, part["p_partkey"] == costs["l_partkey"])
        .select("p_partkey", "p_name", round_to("min_unit_cost", 4).alias("min_unit_cost"))
    )


Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
"""


@register("tpch_q4_priority_checking", oracle=Q4_ORACLE, tags=("tpch", "subquery"))
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: correlated EXISTS with an inequality -> left-semi join carrying
    the correlated predicate in the join condition."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li["l_orderkey"] == orders["o_orderkey"]) & (li["l_shipdate"] > orders["o_orderdate"])
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


@register("tpch_q12_shipmode_priority", oracle=Q12_ORACLE, tags=("tpch", "agg"))
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: boolean-bucketed conditional counts after a fact join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q16_ORACLE = """
SELECT p.p_brand, p.p_type,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 25
GROUP BY p.p_brand, p.p_type
"""


@register("tpch_q16_supplier_cnt", oracle=Q16_ORACLE, tags=("tpch", "agg"))
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: COUNT(DISTINCT) per multi-column group through a join."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q17_ORACLE = """
WITH avg_qty AS (
    SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
    FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem l
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE l.l_quantity < a.half_avg
"""


@register("tpch_q17_small_quantity", oracle=Q17_ORACLE, tags=("tpch", "subquery"))
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: correlated scalar AVG subquery -> self-aggregate + re-join
    (rows below half their part's average quantity)."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(avg_qty, li["l_partkey"] == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(round_to(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


Q22_ORACLE = """
WITH avg_bal AS (
    SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
       COUNT(*) AS numcust,
       ROUND(SUM(c.c_acctbal), 4) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'P')
GROUP BY c.c_nationkey
"""


@register("tpch_q22_global_sales_opportunity", oracle=Q22_ORACLE, tags=("tpch", "subquery"))
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: global scalar subquery + NOT EXISTS anti-join + group."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            round_to(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


Q11_ORACLE = """
WITH per_part AS (
    SELECT l.l_partkey,
           SUM(l.l_extendedprice * (1 - l.l_discount)) AS value
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_2'
    GROUP BY l.l_partkey
),
tot AS (SELECT SUM(value) AS total FROM per_part)
SELECT p.l_partkey, ROUND(p.value, 4) AS value
FROM per_part p, tot t
WHERE p.value > 0.0005 * t.total
"""


@register("tpch_q11_important_stock", oracle=Q11_ORACLE, tags=("tpch", "subquery"))
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: HAVING against a GLOBAL scalar x fraction — per-part value
    for one nation's suppliers, kept only above a share of the nation
    total. (Reshaped over lineitem/supplier; the fixture has no partsupp —
    value is shipped revenue rather than stock value, same plan shape:
    group-aggregate, 1-row global aggregate of the SAME relation,
    broadcast cross join, threshold filter.)

    Scale: per_part is reused for both the group rows and the global sum —
    one shuffle to build it; the total is a 1-row aggregate (broadcast-
    hintable by the plan lint's rules). Threshold compares the raw sums:
    both engines' correctly-rounded doubles sit far from the boundary for
    any non-adversarial data.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    nation_supp = supp.join(
        F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"], "left_semi"
    ).select("s_suppkey")
    per_part = (
        li.join(nation_supp, li["l_suppkey"] == nation_supp["s_suppkey"], "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = per_part.agg(F.sum("value").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.0005 * F.col("total"))
        .select("l_partkey", round_to("value", 4).alias("value"))
    )


Q20_ORACLE = """
WITH widget_parts AS (
    SELECT p_partkey FROM part WHERE CONTAINS(p_name, 'widget')
),
per AS (
    SELECT l_suppkey, l_partkey,
           SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1997
                    THEN l_quantity ELSE 0 END) AS qty97,
           SUM(l_quantity) AS qty_all
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM widget_parts)
    GROUP BY l_suppkey, l_partkey
),
qual AS (SELECT DISTINCT l_suppkey FROM per WHERE qty97 > 0.3 * qty_all)
SELECT s.s_name, ROUND(s.s_acctbal, 4) AS acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
"""


@register("tpch_q20_potential_promotion", oracle=Q20_ORACLE, tags=("tpch", "subquery"))
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: the nested semi-join chain — part-name filter feeds a
    correlated quantity threshold, whose survivors semi-filter supplier,
    intersected with a nation filter. (Reshaped over lineitem; no
    partsupp: the availqty > 0.5 x shipped-qty predicate becomes
    1997-shipped > 0.3 x all-time-shipped per (supplier, part) — the same
    aggregate-threshold-inside-IN-chain plan.)

    Scale: two semi joins (never materializing the multiplied row set),
    one grouped aggregate on (suppkey, partkey); quantities are integral
    doubles, so the 0.3x threshold compare is engine-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")

    li_widget = li.join(
        part.select("p_partkey"), li["l_partkey"] == part["p_partkey"], "left_semi"
    )
    per = li_widget.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(
            F.when(F.year("l_shipdate") == 1997, F.col("l_quantity")).otherwise(0.0)
        ).alias("qty97"),
        F.sum("l_quantity").alias("qty_all"),
    )
    qual = per.filter(F.col("qty97") > 0.3 * F.col("qty_all")).select("l_suppkey").distinct()
    return (
        supp.join(qual, supp["s_suppkey"] == qual["l_suppkey"], "left_semi")
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"], "left_semi")
        .select("s_name", round_to("s_acctbal", 4).alias("acctbal"))
    )
