"""Data-quality constraint checker (operators/quality_checks.py): each
check kind must COUNT violations on dirty data, not just pass on clean."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.quality_checks import (
    Check,
    referential_check,
    run_checks,
)


def test_checks_count_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (1, 20.0, "B"),     # duplicate key
            (None, -5.0, "A"),  # null key + below range
            (3, 999.0, "X"),    # status outside the domain
        ],
        "k long, v double, s string",
    )
    out = {
        r.check_name: (r.metric, r.passed)
        for r in run_checks(
            df,
            [
                Check("not_null", "k"),
                Check("unique", "k"),
                Check("in_range", "v", lo=0.0, hi=100.0),
                Check("in_set", "s", values=("A", "B")),
            ],
        ).collect()
    }
    assert out["not_null(k)"] == (1, False)
    # 4 rows - 2 distinct NON-NULL k values (COUNT DISTINCT skips nulls
    # on both engines) -> 2: one true duplicate + the null row (which the
    # not_null check flags separately)
    assert out["unique(k)"] == (2, False)
    assert out["in_range(v)"] == (2, False)  # -5 and 999
    assert out["in_set(s)"] == (1, False)


def test_clean_table_passes(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "k long, v double")
    out = run_checks(df, [Check("not_null", "k"), Check("unique", "k"), Check("in_range", "v", lo=0.0, hi=10.0)])
    assert all(r.passed and r.metric == 0 for r in out.collect())


def test_single_aggregate_pass(spark):
    """All column-level checks must compile into ONE aggregate (one
    scan): exactly one Exchange (the global-agg SinglePartition one)."""
    df = spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    out = run_checks(df, [Check("not_null", "k"), Check("unique", "k"), Check("in_range", "v", lo=0.0, hi=200.0)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan


def test_referential_orphans(spark):
    facts = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_check(facts, "fk", dim, "pk").collect()[0]
    assert row.check_name == "ref(fk)"
    assert row.metric == 2 and not row.passed
