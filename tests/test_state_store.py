"""Streaming state-store hardening: RocksDB provider parity + proof that
watermark eviction BOUNDS state (the claim behind the reference's
10-minute watermark, ``spark_consumer_kafka.py:78`` — asserted here with
``stateOperators`` metrics rather than assumed).

The bound matters at 100 TB: an unbounded window-state map is the classic
streaming OOM. With a w-minute watermark and t-minute tumbling windows,
steady-state rows-in-state per key is ~(w/t + 2) regardless of how much
event-time the stream has traversed — old windows are finalized and
dropped, so state plateaus while total windows processed grows linearly.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.session import ROCKSDB_PROVIDER, state_store_conf

from tests.test_streaming import run_to_completion

N_KEYS = 3
WINDOW = "5 minutes"
WATERMARK = "10 minutes"
# 40 batches x 5 minutes of event time = 200 minutes traversed: 20x the
# watermark horizon, 40 windows per key created over the run.
N_BATCHES = 40


def _write_batches(src) -> None:
    import os

    src.mkdir()
    base = time.time() - N_BATCHES
    for b in range(N_BATCHES):
        lines = []
        for k in range(N_KEYS):
            minute = 5 * b
            lines.append(json.dumps({
                "user_id": f"u{k}",
                "ts": f"2024-06-01 {10 + minute // 60:02d}:{minute % 60:02d}:30",
                "value": float(b),
            }))
        path = src / f"b{b:03d}.json"
        path.write_text("\n".join(lines) + "\n")
        # The file source orders by modification time; bulk-written files
        # share one mtime, so event-time order would be unstable and the
        # watermark would drop whole "late" files. Pin strictly
        # increasing mtimes to make one-file-per-trigger deterministic.
        os.utime(path, (base + b, base + b))


def _run_windowed(
    spark, tmp_path, provider_conf: dict, *, query_name: str
) -> tuple[int, list[dict], dict]:
    """Run the windowed aggregate over the batch files one file per
    trigger; returns (result_rows, per-batch stateOperators, last one)."""
    src = tmp_path / "in"
    _write_batches(src)
    old = {k: spark.conf.get(k, None) for k in provider_conf}
    for k, v in provider_conf.items():
        spark.conf.set(k, v)
    try:
        events = (
            spark.readStream.schema("user_id string, ts string, value double")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .select("user_id", F.to_timestamp("ts").alias("ts"), "value")
            .withWatermark("ts", WATERMARK)
        )
        agg = events.groupBy(F.window("ts", WINDOW), "user_id").agg(
            F.sum("value").alias("total")
        )
        query = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(query)
        progress = [
            json.loads(p) if isinstance(p, str) else p for p in query.recentProgress
        ]
        states = [p["stateOperators"][0] for p in progress if p.get("stateOperators")]
        n_rows = spark.table(query_name).count()
        return n_rows, states, states[-1]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_watermark_eviction_bounds_state(spark, tmp_path):
    n_rows, states, last = _run_windowed(spark, tmp_path, {}, query_name="sb_default")
    # Finalized (append-mode) windows flow out as event time advances:
    # most of the 40 windows/key are emitted by end of run.
    assert n_rows >= N_KEYS * (N_BATCHES - 4)
    # State PLATEAUS at ~(watermark/window + 2) windows per key — far
    # below the 40 windows/key traversed. Allow slack of 2 extra windows.
    bound = N_KEYS * (10 // 5 + 4)
    tail = [s["numRowsTotal"] for s in states[len(states) // 2:]]
    assert max(tail) <= bound, (max(tail), bound)
    # ...and eviction actually fired: rows were removed along the way.
    assert sum(s["numRowsRemoved"] for s in states) >= N_KEYS * (N_BATCHES - 6)
    assert last["numRowsTotal"] <= bound


def test_rocksdb_provider_same_results_and_bounded_state(spark, tmp_path):
    """The pipeline is provider-agnostic: RocksDB state store produces
    identical results and the same bounded-state plateau, with the
    provider demonstrably in use (memory metrics reported by RocksDB)."""
    n_rows, states, last = _run_windowed(
        spark, tmp_path, state_store_conf("rocksdb"), query_name="sb_rocksdb"
    )
    assert n_rows >= N_KEYS * (N_BATCHES - 4)
    bound = N_KEYS * (10 // 5 + 4)
    tail = [s["numRowsTotal"] for s in states[len(states) // 2:]]
    assert max(tail) <= bound, (max(tail), bound)
    # provider really is RocksDB for this query
    assert "rocksdb" in json.dumps(last.get("customMetrics", {})).lower() or any(
        "rocksdb" in k.lower() for k in last.get("customMetrics", {})
    ), last


def test_state_store_conf_shapes():
    conf = state_store_conf("rocksdb")
    assert conf["spark.sql.streaming.stateStore.providerClass"] == ROCKSDB_PROVIDER
    assert state_store_conf("memory") == {}
    import pytest

    with pytest.raises(ValueError):
        state_store_conf("paper")
