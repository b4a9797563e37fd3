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
HAVING COUNT(*) > 0
"""
# The HAVING is a no-op on real data (every grouping-set row aggregates
# >= 1 input row) and exists for the EMPTY-table edge: standard SQL still
# emits the () grand-total row with COUNT(*)=0, Spark emits nothing — the
# shared template pins both engines to the 0-row behavior (round-8 edge
# sweep).


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
    2x rows, half the columns. The isNotNull filter pins standard SQL
    UNPIVOT semantics (NULL cells produce no row — DuckDB's behavior);
    Spark's DataFrame.unpivot KEEPS them (round-8 all-NULL corpus)."""
    customer = load_table(spark, sf_dir, "customer")
    wide = customer.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return wide.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value").filter(
        F.col("value").isNotNull()
    )


POSEXPLODE_ORACLE = """
SELECT doc_id,
       CAST(r.i - 1 AS INT) AS pos,
       t[CAST(r.i AS INT)] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
     UNNEST(range(1, len(t) + 1)) AS r(i)
"""


@register("sql_lateral_posexplode", oracle=POSEXPLODE_ORACLE, tags=("sql-surface", "explode"))
def sql_lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (LATERAL VIEW posexplode / UNNEST WITH ORDINALITY):
    token position survives the flatten — the shape every sequence-labeling
    or n-gram-position pipeline needs. Pure per-row generator, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


RANGE_FRAME_ORACLE = """
SELECT o_orderkey, o_custkey,
       ROUND(SUM(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
           RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 4) AS sum_30d
FROM orders
"""


@register("window_range_frame_30d", oracle=RANGE_FRAME_ORACLE, tags=("window", "sql-surface"))
def window_range_frame_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per customer, the rolling 30-day order
    total (peers at the same timestamp aggregate together — RANGE, not
    ROWS, semantics). Ordered by epoch seconds so both engines run the
    identical numeric frame; one hash shuffle on the partition key."""
    from pyspark.sql import Window

    from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # TZ-independent epoch seconds: the ntz->timestamp->long cast used
        # previously silently assumed a UTC session (the grading driver's
        # session has no TZ pin; DST shifts would move frame edges by
        # 3600 s). o_orderdate is midnight-valued, so whole days * 86400
        # is exactly DuckDB's epoch() on the naive value, on any host TZ.
        .orderBy(
            (F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long") * 86400)
        )
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        round_to(F.sum("o_totalprice").over(w), 4).alias("sum_30d"),
    )


QUALIFY_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate
FROM (
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
)
WHERE rn = 1
"""


@register("window_qualify_latest_order", oracle=QUALIFY_ORACLE, tags=("window", "sql-surface"))
def window_qualify_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key (the QUALIFY ROW_NUMBER() = 1 idiom — CDC
    snapshot compaction, 'current state' extraction). Catalyst rewrites
    the rank+filter into WindowGroupLimit, so each partition keeps one row
    during the sort instead of ranking everything."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


# Identical recursion text on both engines (INTERVAL month arithmetic is
# common SQL). Carrying the upper bound THROUGH the recursion matters: a correlated scalar subquery in the
# step's WHERE re-runs a full orders scan per iteration (measured 28 s vs
# 1.3 s for the 80-month spine).
RECURSIVE_SPINE_SQL = """
WITH RECURSIVE spine(month_start, hi) AS (
  SELECT date_trunc('month', MIN(o_orderdate)),
         date_trunc('month', MAX(o_orderdate))
  FROM {orders}
  UNION ALL
  SELECT month_start + INTERVAL {one_month}, hi FROM spine WHERE month_start < hi
), per_month AS (
  SELECT date_trunc('month', o_orderdate) AS month_start,
         COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS revenue
  FROM {orders} GROUP BY 1
)
SELECT s.month_start, COALESCE(p.n_orders, 0) AS n_orders,
       COALESCE(p.revenue, 0.0) AS revenue
FROM spine s LEFT JOIN per_month p ON s.month_start = p.month_start
"""


@register(
    "sql_recursive_month_spine",
    oracle=RECURSIVE_SPINE_SQL.format(orders="orders", one_month="1 MONTH"),
    tags=("sql-surface", "recursive-cte"),
)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new SQL surface in Spark 4.x):
    generate the complete month calendar between the first and last order
    date and left-join monthly order counts/revenue onto it — the
    gap-preserving date-spine idiom (months with zero orders appear as
    zero rows, which a plain GROUP BY cannot produce)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(RECURSIVE_SPINE_SQL.format(orders="orders_v", one_month="1 MONTH"))


# Identical text on both engines (both speak SQL:1999 LATERAL); ranking on
# the ROUNDED balance with a key tie-break so both engines order alike.
LATERAL_TOPK_SQL = """
SELECT n.n_name, t.c_custkey, t.acctbal
FROM {nation} n,
LATERAL (
  SELECT c_custkey, ROUND(c_acctbal, 4) AS acctbal
  FROM {customer} c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY ROUND(c_acctbal, 4) DESC, c_custkey
  LIMIT 2
) t
"""


@register(
    "sql_lateral_topk_per_key",
    oracle=LATERAL_TOPK_SQL.format(nation="nation", customer="customer"),
    tags=("sql-surface", "lateral", "topk"),
)
def sql_lateral_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation): the
    for-each-row-of-the-left-table join form. Catalyst DECORRELATES the
    per-nation ORDER BY/LIMIT into a rank-over-window plan — no per-row
    re-execution survives into the physical plan, which is what makes the
    construct usable when the left side is a billion rows, not 25."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(LATERAL_TOPK_SQL.format(nation="nation_v", customer="customer_v"))


FILTERED_AGG_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4) AS open_value,
       ROUND(AVG(o_totalprice) FILTER (WHERE o_totalprice > 100000), 4) AS avg_large
FROM {orders}
GROUP BY o_orderpriority
"""

FILTERED_AGG_ORACLE = FILTERED_AGG_SQL.format(orders="orders")


@register("sql_filtered_aggregates", oracle=FILTERED_AGG_ORACLE, tags=("sql", "agg"))
def sql_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER clause on aggregates (the conditional-aggregation
    surface; Spark compiles each FILTER into the aggregate's own
    predicate — still ONE combinable pass, not one scan per filter).
    Identical SQL text runs on both engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(FILTERED_AGG_SQL.format(orders="orders_v"))
