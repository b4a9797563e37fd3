"""SCD type-2 merge semantics (operators/scd.py)."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from data_pipeline_with_spark_kafka_spark.operators.scd import scd2_apply

D0 = datetime.date(2020, 1, 1)
D1 = datetime.date(2021, 6, 1)
D2 = datetime.date(2022, 3, 1)

SNAP_SCHEMA = "k int, attr string, score double, valid_from date, valid_to date, is_current boolean"
UPD_SCHEMA = "k int, attr string, score double"


def _snapshot(spark):
    return spark.createDataFrame(
        [
            # closed history row: must pass through untouched.
            (1, "old", 1.0, D0, D1, False),
            (1, "a", 1.5, D1, None, True),   # will change
            (2, "b", 2.0, D0, None, True),   # no-op update
            (3, "c", None, D0, None, True),  # no update at all
            (4, None, 4.0, D0, None, True),  # NULL -> value change
        ],
        SNAP_SCHEMA,
    )


def _updates(spark):
    return spark.createDataFrame(
        [
            (1, "a2", 1.5),    # attr changed
            (2, "b", 2.0),     # identical -> keep
            (4, "now", 4.0),   # NULL -> value: a change
            (9, "new", 9.0),   # brand-new key
        ],
        UPD_SCHEMA,
    )


def _rows(df):
    return sorted(df.collect(), key=lambda r: (r.k, r.valid_from, r.is_current))


def test_scd2_merge_verdicts(spark):
    out = scd2_apply(
        _snapshot(spark), _updates(spark), "k", ["attr", "score"], F.lit(D2)
    )
    got = {(r.k, r.attr, r.score, r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert got == {
        (1, "old", 1.0, D0, D1, False),     # history untouched
        (1, "a", 1.5, D1, D2, False),       # closed out
        (1, "a2", 1.5, D2, None, True),     # replacement opened
        (2, "b", 2.0, D0, None, True),      # no-op update kept
        (3, "c", None, D0, None, True),     # untouched key kept
        (4, None, 4.0, D0, D2, False),      # NULL -> value closes
        (4, "now", 4.0, D2, None, True),
        (9, "new", 9.0, D2, None, True),    # insert
    }


def test_scd2_single_open_row_per_key(spark):
    out = scd2_apply(
        _snapshot(spark), _updates(spark), "k", ["attr", "score"], F.lit(D2)
    )
    open_counts = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in open_counts)


def test_scd2_idempotent_replay(spark):
    """Re-applying the same batch to the merged snapshot is a no-op:
    every update now matches the open row exactly."""
    first = scd2_apply(
        _snapshot(spark), _updates(spark), "k", ["attr", "score"], F.lit(D2)
    )
    second = scd2_apply(first, _updates(spark), "k", ["attr", "score"], F.lit(datetime.date(2023, 1, 1)))
    assert _rows(second) == _rows(first)


def test_scd2_empty_batch_is_identity(spark):
    snap = _snapshot(spark)
    empty = spark.createDataFrame([], UPD_SCHEMA)
    out = scd2_apply(snap, empty, "k", ["attr", "score"], F.lit(D2))
    assert _rows(out) == _rows(snap)


def test_scd2_single_shuffle_plan(spark):
    """The merge is one key join: no per-branch re-joins sneaking in."""
    out = scd2_apply(
        _snapshot(spark), _updates(spark), "k", ["attr", "score"], F.lit(D2)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # full-outer SMJ = one exchange per side; anything above means a
    # branch re-joined the inputs.
    assert plan.count("Exchange") <= 2, plan


def test_cdc_apply_semantics(spark):
    from data_pipeline_with_spark_kafka_spark.operators.scd import cdc_apply

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, attr string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", "U", 1),
            (1, "a2", "U", 2),    # later seq wins
            (2, None, "D", 1),    # delete
            (4, "d", "I", 1),     # insert
            (9, None, "D", 1),    # delete of unseen key: no-op
            (5, "e", "U", 1),     # upsert of unseen key inserts
        ],
        "k int, attr string, op string, seq int",
    )
    out = {(r.k, r.attr) for r in cdc_apply(snap, changes, "k", ["attr"], seq_col="seq").collect()}
    assert out == {(1, "a2"), (3, "c"), (4, "d"), (5, "e")}


def test_cdc_apply_replay_converges(spark):
    from data_pipeline_with_spark_kafka_spark.operators.scd import cdc_apply

    snap = spark.createDataFrame([(1, "a")], "k int, attr string")
    changes = spark.createDataFrame(
        [(1, "a2", "U", 1), (2, "b", "I", 2)], "k int, attr string, op string, seq int"
    )
    once = cdc_apply(snap, changes, "k", ["attr"], seq_col="seq")
    twice = cdc_apply(once, changes, "k", ["attr"], seq_col="seq")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_derive_changes_classification(spark):
    from data_pipeline_with_spark_kafka_spark.operators.scd import derive_changes

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k int, attr string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "b2"), (3, "c"), (5, None)], "k int, attr string"
    )
    out = {(r.k, r.op, r.attr) for r in derive_changes(old, new, "k", ["attr"]).collect()}
    assert out == {
        (2, "U", "b2"),   # value change
        (3, "U", "c"),    # NULL -> value is a real update
        (4, "D", None),   # delete payload is nulled
        (5, "I", None),   # insert with an all-NULL payload is still an I
    }
    # unchanged key 1 leaves the feed entirely


def test_derive_changes_cdc_apply_roundtrip(spark):
    """The law that makes dump-diffing sound: applying the derived feed
    to the old snapshot reproduces the new snapshot exactly."""
    from data_pipeline_with_spark_kafka_spark.operators.scd import cdc_apply, derive_changes

    old = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(40)], "k int, a string, b double"
    )
    new = spark.createDataFrame(
        [(i, f"v{i}" if i % 3 else f"w{i}", float(i + (i % 5 == 0)))
         for i in range(40) if i % 7 != 0]
        + [(100, "new", 1.0), (101, None, None)],
        "k int, a string, b double",
    )
    feed = derive_changes(old, new, "k", ["a", "b"])
    applied = cdc_apply(old, feed, "k", ["a", "b"])
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))
