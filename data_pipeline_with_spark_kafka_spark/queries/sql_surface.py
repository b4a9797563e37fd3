"""Queries exercised through the engine's SQL surface (``spark.sql`` over
registered temp views) rather than the DataFrame builder API — same
Catalyst plans, second entry point (SURVEY.md §2.5 [EXT] grouping sets,
right join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

# Near-identical SQL on both engines; the one divergence is the grouping
# indicator function name (Spark: multi-arg GROUPING_ID; DuckDB: multi-arg
# GROUPING) — same bitmask semantics.
GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       {gfn}(o_orderstatus, o_orderpriority) AS gid,
       COUNT(*) AS n_orders
FROM {orders}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register(
    "sql_grouping_sets",
    oracle=GROUPING_SETS_SQL.format(orders="orders", gfn="GROUPING"),
    tags=("agg", "sql-surface"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through spark.sql (the second query entry
    point — same Catalyst plan as the DataFrame builder)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(GROUPING_SETS_SQL.format(orders="orders_v", gfn="GROUPING_ID"))


RIGHT_JOIN_SQL = """
SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
FROM (SELECT * FROM {orders} WHERE o_orderstatus = 'P') o
RIGHT JOIN {customer} c ON o.o_custkey = c.c_custkey
"""


@register(
    "sql_right_join",
    oracle=RIGHT_JOIN_SQL.format(orders="orders", customer="customer"),
    tags=("join", "sql-surface"),
)
def sql_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (every customer preserved; pending orders matched)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(RIGHT_JOIN_SQL.format(orders="orders_v", customer="customer_v"))


UNPIVOT_ORACLE = """
SELECT c_custkey, metric, CAST(value AS DOUBLE) AS value
FROM (
    SELECT c_custkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           CAST(c_nationkey AS DOUBLE) AS nationkey
    FROM customer
)
UNPIVOT (value FOR metric IN (acctbal, nationkey))
"""


@register("sql_unpivot_metrics", oracle=UNPIVOT_ORACLE, tags=("reshape", "sql-surface"))
def sql_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long reshape (``DataFrame.unpivot`` / SQL UNPIVOT, the
    inverse of pivot): per-customer metric columns melted into
    (metric, value) rows. Narrow per-row op — no shuffle; output is
    2x rows, half the columns."""
    customer = load_table(spark, sf_dir, "customer")
    wide = customer.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return wide.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")
