"""Streaming last-touch attribution: cross-batch carry, lookback expiry,
batch-query equivalence under in-order delivery, and state eviction."""

from __future__ import annotations

import json
import os

from data_pipeline_with_spark_kafka_spark.streaming.attribution_stream import (
    attribute_purchases_stream,
)
from tests.test_stateful_streaming import drain

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _line(event_id, ts, user_id, etype, value=0.0):
    return (
        json.dumps(
            {
                "event_id": event_id,
                "ts": ts,
                "user_id": user_id,
                "event_type": etype,
                "value": value,
            }
        )
        + "\n"
    )


def _run(spark, src, ckpt, **kw):
    emitted = []

    def collect(df, epoch):
        emitted.extend(
            (epoch, r.user_id, r.event_id, r.touch_type, r.value)
            for r in df.collect()
        )

    raw = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        attribute_purchases_stream(raw, **kw)
        .writeStream.outputMode("update")
        .foreachBatch(collect)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return emitted


def test_attribution_cross_batch_carry_and_expiry(spark, tmp_path):
    src = tmp_path / "at_in"
    ckpt = tmp_path / "at_ck"
    src.mkdir()
    # Batch 0: user 1 views; user 2 clicks (its purchase comes 8 days
    # later -> expired); user 3 purchases with no history.
    (src / "f1.json").write_text(
        _line(101, "2024-06-01 10:00:00", 1, "view")
        + _line(201, "2024-06-01 10:00:00", 2, "click")
        + _line(301, "2024-06-01 10:00:01", 3, "purchase", 30.0)
    )
    # Batch 1: user 1 purchases (touch carried from batch 0); an
    # interleaved signup must not disturb the carry.
    (src / "f2.json").write_text(
        _line(102, "2024-06-01 11:00:00", 1, "signup")
        + _line(103, "2024-06-01 12:00:00", 1, "purchase", 10.0)
    )
    # Batch 2: user 2's purchase 8 days after its only touch -> expired.
    (src / "f3.json").write_text(
        _line(202, "2024-06-09 10:00:01", 2, "purchase", 20.0)
    )
    for i, f in enumerate(["f1.json", "f2.json", "f3.json"]):
        os.utime(src / f, (i + 1, i + 1))

    emitted = _run(spark, src, ckpt, lookback="7 days", watermark="1 second")
    verdicts = {eid: t for _, _, eid, t, _ in emitted}
    assert verdicts == {301: "unattributed", 103: "view", 202: "unattributed"}


def test_attribution_stream_equals_batch_query(spark, tmp_path):
    """In-order delivery => the stream's per-purchase verdicts are
    row-for-row the batch window query's, including same-timestamp ties
    broken on event_id."""
    import pandas as pd

    from data_pipeline_with_spark_kafka_spark.queries import all_queries

    rows = [
        (101, "2024-03-01 12:00:00", 1, "view", 0.0),
        (102, "2024-03-01 13:00:00", 1, "click", 0.0),
        (103, "2024-03-01 14:00:00", 1, "purchase", 10.0),
        (201, "2024-03-01 12:00:00", 2, "click", 0.0),
        (202, "2024-03-09 12:00:01", 2, "purchase", 20.0),
        (301, "2024-03-01 12:00:00", 3, "purchase", 30.0),
        (401, "2024-03-01 12:00:00", 4, "view", 0.0),
        (402, "2024-03-01 12:00:00", 4, "click", 0.0),
        (403, "2024-03-01 13:00:00", 4, "purchase", 40.0),
        (501, "2024-03-01 12:00:00", 5, "purchase", 50.0),
        (502, "2024-03-01 13:00:00", 5, "view", 0.0),
        (503, "2024-03-08 13:00:00", 5, "purchase", 60.0),
    ]
    # Stream side: one time-ordered file per hour-of-arrival.
    src = tmp_path / "eq_in"
    ckpt = tmp_path / "eq_ck"
    src.mkdir()
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    third = (len(ordered) + 2) // 3
    for i in range(3):
        chunk = ordered[i * third:(i + 1) * third]
        (src / f"f{i}.json").write_text(
            "".join(_line(*r) for r in chunk)
        )
        os.utime(src / f"f{i}.json", (i + 1, i + 1))
    emitted = _run(spark, src, ckpt, lookback="7 days", watermark="1 second")
    stream_verdicts = {eid: t for _, _, eid, t, _ in emitted}

    # Batch side: the registered query's per-type rollup on the same rows.
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["props"] = "{}"
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    batch = {
        r.touch_type: (r.n_purchases, r.attributed_value)
        for r in all_queries()["events_attribution_last_touch"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    from collections import Counter

    stream_counts = Counter(stream_verdicts.values())
    stream_value: dict[str, float] = {}
    for _, _, eid, t, v in emitted:
        stream_value[t] = stream_value.get(t, 0.0) + v
    assert {t: batch[t][0] for t in batch} == dict(stream_counts)
    for t in batch:
        assert abs(batch[t][1] - stream_value[t]) < 1e-6


def test_attribution_state_evicts_after_lookback(spark, tmp_path):
    """A user idle past the lookback horizon must leave NO state row
    (watermark-driven timeout): state is bounded by active users."""
    src = tmp_path / "ev_in"
    ckpt = tmp_path / "ev_ck"
    src.mkdir()
    (src / "f1.json").write_text(_line(1, "2024-06-01 10:00:00", 1, "view"))
    # 9 days later (past the 7-day lookback): another user's activity
    # advances the watermark; user 1's touch times out and is removed.
    (src / "f2.json").write_text(_line(2, "2024-06-10 10:00:00", 2, "view"))
    (src / "f3.json").write_text(_line(3, "2024-06-10 10:00:02", 2, "view"))
    # User 1 purchases AFTER its state was evicted -> unattributed (the
    # touch would have been out of lookback anyway — eviction is safe).
    (src / "f4.json").write_text(
        _line(4, "2024-06-10 10:00:04", 1, "purchase", 5.0)
    )
    for i, f in enumerate(["f1.json", "f2.json", "f3.json", "f4.json"]):
        os.utime(src / f, (i + 1, i + 1))

    emitted = _run(spark, src, ckpt, lookback="7 days", watermark="1 second")
    verdicts = {eid: t for _, _, eid, t, _ in emitted}
    assert verdicts == {4: "unattributed"}


def test_attribution_survives_restart(spark, tmp_path):
    """A second run against the same checkpoint recovers the carried
    touch: a purchase arriving after restart still attributes to a touch
    seen before the restart."""
    src = tmp_path / "rs_in"
    ckpt = tmp_path / "rs_ck"
    src.mkdir()
    (src / "f1.json").write_text(_line(1, "2024-06-01 10:00:00", 1, "click"))
    os.utime(src / "f1.json", (1, 1))
    first = _run(spark, src, ckpt, lookback="7 days", watermark="1 second")
    assert first == []  # a lone touch emits nothing

    (src / "f2.json").write_text(_line(2, "2024-06-01 11:00:00", 1, "purchase", 9.0))
    os.utime(src / "f2.json", (2, 2))
    second = _run(spark, src, ckpt, lookback="7 days", watermark="1 second")
    assert [(eid, t) for _, _, eid, t, _ in second] == [(2, "click")]


def test_attribution_out_of_order_delivery_and_batch_reconciliation(spark, tmp_path):
    """Out-of-order delivery, pinned (round-8 verdict task #4). The golden
    log has a click that ARRIVES two micro-batches late — after a purchase
    it would have claimed was already emitted:

        logical order: view@10:00, click@12:00, purchase@14:00, purchase@16:00
        arrival order: [view@10] [purchase@14] [click@12, purchase@16]

    (a) At-attribution-time semantics (the module's documented contract):
    the late touch is NOT dropped by the watermark (applyInPandasWithState
    leaves late-row filtering to the user function) and affects only
    SUBSEQUENT purchases — purchase@14 keeps its already-emitted 'view'
    verdict, purchase@16 gets 'click'.
    (b) Lambda reconciliation: the in-order streaming replay of the same
    log row-for-row equals the batch query (which sees full history and
    says 'click' for BOTH purchases) — so the batch pass heals exactly the
    late-arrival divergence and nothing else."""
    golden = [
        (101, "2024-06-01 10:00:00", 1, "view", 0.0),
        (102, "2024-06-01 12:00:00", 1, "click", 0.0),
        (103, "2024-06-01 14:00:00", 1, "purchase", 10.0),
        (104, "2024-06-01 16:00:00", 1, "purchase", 20.0),
    ]
    by_id = {r[0]: r for r in golden}

    # --- shuffled arrival: click 102 lands AFTER purchase 103's batch ---
    src = tmp_path / "ooo_in"
    ckpt = tmp_path / "ooo_ck"
    src.mkdir()
    (src / "f1.json").write_text(_line(*by_id[101]))
    (src / "f2.json").write_text(_line(*by_id[103]))
    (src / "f3.json").write_text(_line(*by_id[102]) + _line(*by_id[104]))
    for i, f in enumerate(["f1.json", "f2.json", "f3.json"]):
        os.utime(src / f, (i + 1, i + 1))
    shuffled = _run(spark, src, ckpt, lookback="7 days", watermark="1 second")
    shuffled_verdicts = {eid: t for _, _, eid, t, _ in shuffled}
    assert shuffled_verdicts == {103: "view", 104: "click"}

    # --- in-order replay of the same log ---
    src2 = tmp_path / "ord_in"
    ckpt2 = tmp_path / "ord_ck"
    src2.mkdir()
    (src2 / "f1.json").write_text(_line(*by_id[101]) + _line(*by_id[102]))
    (src2 / "f2.json").write_text(_line(*by_id[103]))
    (src2 / "f3.json").write_text(_line(*by_id[104]))
    for i, f in enumerate(["f1.json", "f2.json", "f3.json"]):
        os.utime(src2 / f, (i + 1, i + 1))
    ordered = _run(spark, src2, ckpt2, lookback="7 days", watermark="1 second")
    ordered_verdicts = {eid: t for _, _, eid, t, _ in ordered}
    assert ordered_verdicts == {103: "click", 104: "click"}

    # --- batch query over the same rows == the in-order streaming run ---
    import pandas as pd

    from data_pipeline_with_spark_kafka_spark.queries import all_queries

    pdf = pd.DataFrame(golden, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["props"] = "{}"
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    batch = {
        r.touch_type: r.n_purchases
        for r in all_queries()["events_attribution_last_touch"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    from collections import Counter

    assert batch == dict(Counter(ordered_verdicts.values()))
    # The shuffled-vs-batch divergence is EXACTLY the purchases emitted
    # before the late touch arrived — nothing else moved.
    assert {e for e in ordered_verdicts if ordered_verdicts[e] != shuffled_verdicts[e]} == {103}
