"""Data-quality constraint suite as a registered query (operator:
operators/quality_checks.py). The whole column-level suite is ONE scan +
one global aggregate; the referential check is one anti-join count."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_with_spark_kafka_spark.operators.quality_checks import (
    Check,
    referential_check,
    run_checks,
)
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

# Violation counts, mirrored check-for-check; metric = violations (0 = clean).
DQ_ORDERS_ORACLE = """
-- COALESCE: SUM over an EMPTY table is NULL in SQL, but the Spark suite
-- counts violations (0 on empty) — and an empty batch PASSES a DQ gate.
SELECT 'not_null(o_orderkey)' AS check_name,
       CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS metric,
       COALESCE(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) = 0 AS passed
FROM orders
UNION ALL
SELECT 'unique(o_orderkey)',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
       COUNT(*) - COUNT(DISTINCT o_orderkey) = 0
FROM orders
UNION ALL
SELECT 'in_range(o_totalprice)',
       CAST(COALESCE(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END), 0) AS BIGINT),
       COALESCE(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END), 0) = 0
FROM orders
UNION ALL
SELECT 'in_set(o_orderstatus)',
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END), 0) AS BIGINT),
       COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END), 0) = 0
FROM orders
UNION ALL
SELECT 'ref(o_custkey)',
       CAST(COUNT(*) AS BIGINT),
       COUNT(*) = 0
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
"""


@register("dq_orders_constraints", oracle=DQ_ORDERS_ORACLE, tags=("quality", "dq"))
def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite over orders: key not-null +
    uniqueness, price range, status domain (ONE aggregate pass for all
    four) plus customer referential integrity (one anti-join count).
    The training-data-pipeline gatekeeper shape: admit a batch only when
    every metric is 0."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    suite = run_checks(
        orders,
        [
            Check("not_null", "o_orderkey"),
            Check("unique", "o_orderkey"),
            Check("in_range", "o_totalprice", lo=0.0, hi=1_000_000.0),
            Check("in_set", "o_orderstatus", values=("F", "O", "P")),
        ],
    )
    ref = referential_check(orders, "o_custkey", customer, "c_custkey")
    return suite.unionByName(ref)
