"""Tests for the custom stateful operator (applyInPandasWithState) and the
watermarked stream-stream join."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.streaming.covid_pipeline import parse_events
from data_pipeline_with_spark_kafka_spark.streaming.stateful import (
    running_totals,
    stream_stream_join,
)


def drain(query, timeout=600):
    # availableNow queries terminate deterministically, but on a co-tenant
    # box a micro-batch can take minutes under load — the deadline is a
    # hang backstop, not a performance assertion.
    deadline = time.time() + timeout
    while query.isActive and time.time() < deadline:
        query.awaitTermination(2)
    if query.isActive:
        status = query.status
        query.stop()
        raise AssertionError(f"stream did not drain in {timeout}s; status={status}")
    if query.exception() is not None:
        raise AssertionError(f"stream failed: {query.exception()}")


def event_line(t, loc, n):
    return json.dumps(
        {"value": json.dumps({"event_time": t, "location": loc, "new_cases": n, "total_cases": n})}
    )


def test_apply_in_pandas_with_state_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "st_in"
    ckpt = tmp_path / "st_ck"
    src.mkdir()
    (src / "f1.json").write_text(
        event_line("2024-06-01 10:00:00", "A", 5) + "\n" + event_line("2024-06-01 10:00:30", "B", 2) + "\n"
    )
    (src / "f2.json").write_text(event_line("2024-06-01 10:01:00", "A", 7) + "\n")
    import os

    os.utime(src / "f1.json", (1, 1))

    emitted = []

    def collect(df, epoch):
        emitted.extend((epoch, r.location, r.n_events, r.total_new_cases) for r in df.collect())

    raw = (
        spark.readStream.schema("value string").option("maxFilesPerTrigger", "1").json(str(src))
    )
    q = (
        running_totals(parse_events(raw))
        .writeStream.outputMode("update")
        .foreachBatch(collect)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)

    per_epoch = {(e, loc): (n, tot) for e, loc, n, tot in emitted}
    assert per_epoch[(0, "A")] == (1, 5.0)
    assert per_epoch[(0, "B")] == (1, 2.0)
    # state carried across micro-batches: A accumulates 5 + 7
    assert per_epoch[(1, "A")] == (2, 12.0)


def test_apply_in_pandas_with_state_survives_restart(spark, tmp_path):
    """State recovery: a second run against the same checkpoint continues
    accumulating from the persisted per-key state."""
    src = tmp_path / "rs_in"
    ckpt = tmp_path / "rs_ck"
    src.mkdir()
    emitted = []

    def collect(df, epoch):
        emitted.extend((r.location, r.n_events, r.total_new_cases) for r in df.collect())

    def run_once():
        raw = spark.readStream.schema("value string").json(str(src))
        q = (
            running_totals(parse_events(raw))
            .writeStream.outputMode("update")
            .foreachBatch(collect)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        drain(q)

    (src / "r1.json").write_text(event_line("2024-06-01 10:00:00", "A", 5) + "\n")
    run_once()
    assert ("A", 1, 5.0) in emitted

    (src / "r2.json").write_text(event_line("2024-06-01 11:00:00", "A", 7) + "\n")
    emitted.clear()
    run_once()
    # 5 (recovered from state store) + 7 (new) — not 7 alone.
    assert ("A", 2, 12.0) in emitted


def test_repartition_for_output(spark, sf_dir):
    from data_pipeline_with_spark_kafka_spark.sources.layout import repartition_for_output

    li = load_table_for(spark, sf_dir)
    shrunk = repartition_for_output(li, target_partitions=2)
    assert shrunk.rdd.getNumPartitions() == 2
    grown = repartition_for_output(shrunk, target_partitions=8)
    assert grown.rdd.getNumPartitions() == 8
    assert grown.count() == li.count()


def load_table_for(spark, sf_dir):
    from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "lineitem")


def test_stream_stream_join_within_time_bound(spark, tmp_path):
    lsrc, rsrc, ckpt = tmp_path / "l", tmp_path / "r", tmp_path / "ck"
    lsrc.mkdir()
    rsrc.mkdir()

    def impression(t, key):
        return json.dumps({"ad": key, "imp_time": t})

    def click(t, key):
        return json.dumps({"ad": key, "click_time": t})

    (lsrc / "l.json").write_text(
        impression("2024-06-01 10:00:00", "ad1") + "\n" + impression("2024-06-01 10:00:00", "ad2") + "\n"
    )
    (rsrc / "r.json").write_text(
        click("2024-06-01 10:02:00", "ad1")  # within 5 min -> joins
        + "\n"
        + click("2024-06-01 10:30:00", "ad2")  # beyond 5 min -> no join
        + "\n"
    )

    left = (
        spark.readStream.schema("ad string, imp_time string").json(str(lsrc))
        .withColumn("imp_time", F.to_timestamp("imp_time"))
    )
    right = (
        spark.readStream.schema("ad string, click_time string").json(str(rsrc))
        .withColumn("click_time", F.to_timestamp("click_time"))
    )
    joined = stream_stream_join(
        left, right, key="ad", left_time="imp_time", right_time="click_time", max_lag="5 minutes"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    ads = sorted(r.ad for r in spark.sql("SELECT ad FROM ssj_out").collect())
    assert ads == ["ad1"]


def test_stream_stream_left_outer_state_survives_checkpoint_restart(spark, tmp_path):
    """Kill-and-restart contract for stream-stream join state: run 1 buffers
    an unmatched impression in the state store and stops; run 2 (same
    checkpoint, new data) must emit its null-padded row EXACTLY once — the
    buffered left row is neither lost (no null emission ever) nor replayed
    (duplicate emission) across the restart."""
    lsrc, rsrc, ckpt = tmp_path / "lr", tmp_path / "rr", tmp_path / "ckr"
    lsrc.mkdir()
    rsrc.mkdir()

    emitted = []

    def collect(df, epoch):
        emitted.extend((r.ad, r.click_time) for r in df.collect())

    def run_once():
        left = (
            spark.readStream.schema("ad string, imp_time string").json(str(lsrc))
            .withColumn("imp_time", F.to_timestamp("imp_time"))
        )
        right = (
            spark.readStream.schema("ad string, click_time string").json(str(rsrc))
            .withColumn("click_time", F.to_timestamp("click_time"))
        )
        joined = stream_stream_join(
            left, right, key="ad", left_time="imp_time", right_time="click_time",
            max_lag="5 minutes", how="left_outer",
        )
        q = (
            joined.writeStream.outputMode("append")
            .foreachBatch(collect)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        drain(q)

    # run 1: ad1 matches within the lag; ad2 stays buffered (watermark has
    # not passed its eviction bound when the query drains and stops)
    (lsrc / "l1.json").write_text(
        json.dumps({"ad": "ad1", "imp_time": "2024-06-01 10:00:00"}) + "\n"
        + json.dumps({"ad": "ad2", "imp_time": "2024-06-01 10:00:00"}) + "\n"
    )
    (rsrc / "r1.json").write_text(
        json.dumps({"ad": "ad1", "click_time": "2024-06-01 10:02:00"}) + "\n"
    )
    run_once()
    first_run = list(emitted)
    assert ("ad2", None) not in first_run, "null row must not pre-empt the watermark"

    # run 2: restart from the checkpoint; filler on both sides pushes the
    # watermark past ad2's eviction bound (10:00 + 5 min lag + 10 min delay)
    (lsrc / "l2.json").write_text(
        json.dumps({"ad": "fill_l", "imp_time": "2024-06-01 12:00:00"}) + "\n"
    )
    (rsrc / "r2.json").write_text(
        json.dumps({"ad": "fill_r", "click_time": "2024-06-01 12:00:00"}) + "\n"
    )
    (lsrc / "l3.json").write_text(
        json.dumps({"ad": "fill_l2", "imp_time": "2024-06-01 12:30:00"}) + "\n"
    )
    (rsrc / "r3.json").write_text(
        json.dumps({"ad": "fill_r2", "click_time": "2024-06-01 12:30:00"}) + "\n"
    )
    run_once()

    matched = [e for e in emitted if e[0] == "ad1"]
    nulls = [e for e in emitted if e[1] is None and e[0] == "ad2"]
    assert len(matched) == 1 and matched[0][1] is not None  # exactly-once match
    assert len(nulls) == 1, f"ad2 null row must appear exactly once, got {emitted}"


def test_stream_stream_left_outer_emits_null_after_eviction(spark, tmp_path):
    """Left-outer stream-stream join: the unmatched impression must emit a
    null-click row, but ONLY after the watermark passes its join-state
    eviction bound — later filler events on both sides advance it."""
    lsrc, rsrc, ckpt = tmp_path / "lo", tmp_path / "ro", tmp_path / "cko"
    lsrc.mkdir()
    rsrc.mkdir()

    def impression(t, key):
        return json.dumps({"ad": key, "imp_time": t})

    def click(t, key):
        return json.dumps({"ad": key, "click_time": t})

    # batch 1: two impressions, one gets a click
    (lsrc / "l1.json").write_text(
        impression("2024-06-01 10:00:00", "ad1") + "\n" + impression("2024-06-01 10:00:00", "ad2") + "\n"
    )
    (rsrc / "r1.json").write_text(click("2024-06-01 10:02:00", "ad1") + "\n")
    # batches 2-3: filler far in the future pushes the watermark past
    # ad2's eviction bound (imp 10:00 + 5 min lag + 10 min watermark)
    (lsrc / "l2.json").write_text(impression("2024-06-01 12:00:00", "ad_fill_l") + "\n")
    (rsrc / "r2.json").write_text(click("2024-06-01 12:00:00", "ad_fill_r") + "\n")
    (lsrc / "l3.json").write_text(impression("2024-06-01 12:30:00", "ad_fill_l2") + "\n")
    (rsrc / "r3.json").write_text(click("2024-06-01 12:30:00", "ad_fill_r2") + "\n")

    left = (
        spark.readStream.schema("ad string, imp_time string")
        .option("maxFilesPerTrigger", 1)
        .json(str(lsrc))
        .withColumn("imp_time", F.to_timestamp("imp_time"))
    )
    right = (
        spark.readStream.schema("ad string, click_time string")
        .option("maxFilesPerTrigger", 1)
        .json(str(rsrc))
        .withColumn("click_time", F.to_timestamp("click_time"))
    )
    joined = stream_stream_join(
        left, right, key="ad", left_time="imp_time", right_time="click_time",
        max_lag="5 minutes", how="left_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    rows = {r.ad: r.click_time for r in spark.sql("SELECT ad, click_time FROM ssj_outer").collect()}
    assert rows.get("ad1") is not None          # matched within the lag
    assert "ad2" in rows and rows["ad2"] is None  # evicted unmatched -> null-padded
