"""As-of join operator: direction/tie/tolerance/inner semantics on pinned
micro-fixtures (the registered query's DuckDB ASOF oracle covers the bulk
statistical case; these pin the edges the oracle can't isolate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.asof import asof_join


def make_sides(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", "2024-06-01 10:00:00"),
            (2, "k1", "2024-06-01 12:00:00"),
            (3, "k2", "2024-06-01 09:00:00"),  # before any right row
            (4, "k3", "2024-06-01 10:00:00"),  # key absent on the right
        ],
        "lid int, k string, lts string",
    ).withColumn("lts", F.to_timestamp("lts"))
    right = spark.createDataFrame(
        [
            ("k1", "2024-06-01 09:30:00", 1.0),
            ("k1", "2024-06-01 10:00:00", 2.0),  # ties lid=1 exactly
            ("k1", "2024-06-01 11:00:00", 3.0),
            ("k2", "2024-06-01 09:30:00", 4.0),
        ],
        "k string, rts string, rv double",
    ).withColumn("rts", F.to_timestamp("rts"))
    return left, right


def rows_by_id(df):
    return {r.lid: (r.matched_rts, r.rv) for r in df.collect()}


def test_backward_matches_latest_at_or_before(spark):
    left, right = make_sides(spark)
    out = rows_by_id(
        asof_join(left, right, key="k", left_ts="lts", right_ts="rts", right_cols=["rv"])
    )
    assert out[1][1] == 2.0  # tie at 10:00 matches (<= semantics)
    assert out[2][1] == 3.0  # latest preceding, not first
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (None, None)  # key absent
    assert len(out) == 4  # left join keeps unmatched


def test_forward_matches_earliest_at_or_after(spark):
    left, right = make_sides(spark)
    out = rows_by_id(
        asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            right_cols=["rv"], direction="forward",
        )
    )
    assert out[1][1] == 2.0  # tie still matches
    assert out[2] == (None, None)  # nothing after 12:00
    assert out[3][1] == 4.0  # first following


def test_tolerance_nulls_out_stale_matches(spark):
    left, right = make_sides(spark)
    out = rows_by_id(
        asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            right_cols=["rv"], tolerance_seconds=1800,
        )
    )
    assert out[1][1] == 2.0  # gap 0 <= 30 min
    assert out[2] == (None, None)  # gap 1h > 30 min -> nulled


def test_inner_drops_unmatched(spark):
    left, right = make_sides(spark)
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_cols=["rv"], how="inner",
    )
    assert sorted(r.lid for r in out.collect()) == [1, 2]  # k2 pre-window, k3 absent


def test_rejects_colliding_and_bad_args(spark):
    left, right = make_sides(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "lid"), key="k",
                  left_ts="lts", right_ts="rts", right_cols=["lid"])
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                  right_cols=["rv"], direction="nearest")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                  right_cols=["rv"], how="full")


def test_single_shuffle_on_key(spark):
    """Plan discipline: the whole as-of join is ONE exchange (hash on the
    key) + one sort — the sort-merge-join shape, nothing quadratic."""
    left, right = make_sides(spark)
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts", right_cols=["rv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
