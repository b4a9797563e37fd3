"""Cost-based-optimizer statistics: ANALYZE TABLE feeds the planner
size/row estimates so broadcast elections happen at PLAN time (before
AQE's runtime fallback), and column-level NDV/min/max land in the
catalog for join-order costing.

At 100 TB the difference matters: AQE can only demote/promote joins at
stage boundaries after a shuffle has been planned; a table with stats
gets the broadcast plan straight from the optimizer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def stats_tables(spark):
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    ).write.mode("overwrite").saveAsTable("cbo_dim")
    spark.range(0, 20000).select(
        (F.col("id") % 50).alias("k"), (F.col("id") * 1.5).alias("v")
    ).write.mode("overwrite").saveAsTable("cbo_fact")
    yield
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")


def test_analyze_table_stats_reach_the_catalog(spark, stats_tables):
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR COLUMNS k, name")
    desc = {
        r.info_name: r.info_value
        for r in spark.sql("DESCRIBE EXTENDED cbo_dim k").collect()
    }
    assert desc.get("distinct_count") not in (None, "NULL"), desc
    assert int(desc["distinct_count"]) >= 45  # NDV estimate of 50 keys
    tbl = spark.sql("DESCRIBE TABLE EXTENDED cbo_dim").collect()
    stats_row = [r for r in tbl if r.col_name == "Statistics"]
    assert stats_row and "rows" in stats_row[0].data_type  # "N bytes, 50 rows"


def test_stats_elect_broadcast_at_plan_time(spark, stats_tables):
    """With stats on the dim, the OPTIMIZED (pre-execution, pre-AQE)
    plan already chooses broadcast for dim⋈fact."""
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
    joined = spark.table("cbo_fact").join(spark.table("cbo_dim"), "k")
    plan = joined._jdf.queryExecution().sparkPlan().toString()  # pre-AQE
    assert "BroadcastHashJoin" in plan, plan
