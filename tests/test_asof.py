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


def test_null_left_timestamp_matches_nothing(spark):
    """A null left timestamp must never match — forward direction sorts
    nulls last, where an ungated carry-forward would hand them the
    minimum-ts right payload (advisor-flagged edge)."""
    left, right = make_sides(spark)
    left = left.union(
        left.sparkSession.createDataFrame(
            [(99, "k1", None)], "lid int, k string, lts timestamp"
        )
    )
    for direction in ("backward", "forward"):
        out = rows_by_id(
            asof_join(
                left, right, key="k", left_ts="lts", right_ts="rts",
                right_cols=["rv"], direction=direction,
            )
        )
        assert out[99] == (None, None), direction
    # and inner drops the null-ts row entirely
    inner = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_cols=["rv"], direction="forward", how="inner",
    )
    assert 99 not in {r.lid for r in inner.collect()}


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


def test_matches_pandas_merge_asof_on_random_series(spark):
    """Independent-reference property: on randomized keyed time series the
    operator must agree row-for-row with pandas.merge_asof (same backward +
    allow-exact-matches + tolerance semantics), across several seeds in
    one DataFrame round-trip per seed."""
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n_l, n_r = 200, 150
        lpdf = pd.DataFrame(
            {
                "lid": np.arange(n_l),
                "k": rng.integers(0, 8, n_l).astype("int64"),
                "lts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 10**6, n_l), unit="s"),
            }
        )
        rpdf = pd.DataFrame(
            {
                "k": rng.integers(0, 8, n_r).astype("int64"),
                "rts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 10**6, n_r), unit="s"),
                "rv": rng.normal(size=n_r).round(6),
            }
        )
        # merge_asof requires globally sorted 'on' keys and UNIQUE right
        # (k, rts) pairs for a deterministic match (our operator breaks
        # ties arbitrarily, which is fine for real data but not for a
        # row-for-row comparison).
        rpdf = rpdf.drop_duplicates(["k", "rts"])
        expected = pd.merge_asof(
            lpdf.sort_values("lts"),
            rpdf.sort_values("rts"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction="backward",
            tolerance=pd.Timedelta(seconds=50_000),
        ).sort_values("lid")

        out = asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            key="k",
            left_ts="lts",
            right_ts="rts",
            right_cols=["rv"],
            tolerance_seconds=50_000,
        ).toPandas().sort_values("lid")

        got = list(zip(out["lid"], out["rv"].round(6).fillna(-999)))
        want = list(zip(expected["lid"], expected["rv"].round(6).fillna(-999)))
        assert got == want, f"seed {seed}: mismatch"
