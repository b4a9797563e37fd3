"""Time-series resample + linear interpolation (operators/timeseries.py)."""

from __future__ import annotations

import datetime

from data_pipeline_with_spark_kafka_spark.operators.timeseries import resample_linear


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def _df(spark):
    rows = [
        # key "a": observations at hours 0, 0 (second in-bucket), 3, 5
        ("a", _ts(0, 10), 1.0),
        ("a", _ts(0, 50), 3.0),   # bucket 0 avg = 2.0
        ("a", _ts(3, 0), 8.0),    # hours 1,2 are gaps
        ("a", _ts(5, 0), 10.0),   # hour 4 is a gap
        # key "b": single observation -> spine is one bucket, no gaps
        ("b", _ts(7, 30), 5.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, value double")


def test_interpolation_values(spark):
    out = resample_linear(_df(spark), "k", "ts", "value", step="1 hour")
    got = {(r.k, r.bucket.hour): (r.was_gap, r.value_filled) for r in out.collect()}
    assert got == {
        ("a", 0): (False, 2.0),
        ("a", 1): (True, 4.0),    # 2 + (8-2) * 1/3
        ("a", 2): (True, 6.0),    # 2 + (8-2) * 2/3
        ("a", 3): (False, 8.0),
        ("a", 4): (True, 9.0),    # midpoint of 8 and 10
        ("a", 5): (False, 10.0),
        ("b", 7): (False, 5.0),
    }


def test_grid_is_dense_and_bounded(spark):
    out = resample_linear(_df(spark), "k", "ts", "value", step="1 hour").collect()
    a_buckets = sorted(r.bucket for r in out if r.k == "a")
    assert a_buckets == [_ts(h) for h in range(6)]  # no holes, no overrun
    assert [r.bucket for r in out if r.k == "b"] == [_ts(7)]


def test_spine_never_scans_raw_events(spark):
    """The sequence() grid must be generated from the aggregated
    relation, not the raw input: the plan has exactly one aggregate
    over the raw scan (hourly), everything else reads its cache."""
    out = resample_linear(_df(spark), "k", "ts", "value", step="1 hour")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan  # persisted hourly is reused


def test_multi_unit_step_observations_stay_on_grid(spark):
    """Steps whose count is not 1 ("2 hours", "15 minutes") must bucket
    onto the SAME grid the spine walks — a date_trunc(unit) bucket
    would land hour-1/3/5 observations off the 2-hour grid and silently
    drop them in the spine join (interpolating instead of averaging)."""
    rows = [
        ("a", _ts(0, 0), 2.0),
        ("a", _ts(1, 0), 4.0),   # same 2h bucket as hour 0 -> avg 3.0
        ("a", _ts(4, 30), 9.0),  # bucket 4; bucket 2 is a gap
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = resample_linear(df, "k", "ts", "value", step="2 hours")
    got = {(r.k, r.bucket.hour): (r.was_gap, r.value_filled) for r in out.collect()}
    assert got == {
        ("a", 0): (False, 3.0),  # averaged, not dropped
        ("a", 2): (True, 6.0),   # midpoint of 3 and 9
        ("a", 4): (False, 9.0),
    }


def test_fifteen_minute_step(spark):
    rows = [
        ("a", _ts(0, 5), 1.0),    # bucket 00:00
        ("a", _ts(0, 50), 5.0),   # bucket 00:45; 00:15 and 00:30 gaps
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = resample_linear(df, "k", "ts", "value", step="15 minutes")
    got = {r.bucket.minute: (r.was_gap, r.value_filled) for r in out.collect()}
    assert got == {
        0: (False, 1.0),
        15: (True, 2.3333),  # 1 + 4/3, rounded to scale=4
        30: (True, 3.6667),  # 1 + 8/3
        45: (False, 5.0),
    }


def test_bad_step_raises(spark):
    import pytest

    df = _df(spark)
    with pytest.raises(ValueError):
        resample_linear(df, "k", "ts", "value", step="fortnight")
    with pytest.raises(ValueError):
        resample_linear(df, "k", "ts", "value", step="0 hours")
