"""Streaming throughput benchmark: drive the reference-parity windowed
pipeline from a rate source and report processed rows/second.

The reference's extract side publishes one message per blocking
``future.get()`` round-trip — a ~100 msg/s ceiling (BASELINE.md). This
harness measures the engine-side equivalent: rate-source events flow
through the same parse -> watermark -> 1-minute window aggregate ->
stream-static join -> derived-metric pipeline the reference runs, into a
noop-equivalent memory sink, and throughput is total input rows / wall
seconds over a fixed run.

Usage: python tools/stream_bench.py [rows_per_second] [run_seconds]
Prints one JSON line {"metric": "stream_rows_per_sec", ...}.
``measure(spark, ...)`` is the importable form bench.py uses to append
the same metric line to the per-round bench artifact.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.streaming.covid_pipeline import (
    windowed_enrichment,
)


def measure(spark, rate: int = 200_000, run_seconds: int = 90) -> dict:
    """Run the rate-source windowed pipeline and return the metric dict
    {"metric": "stream_rows_per_sec", ...} (value 0.0 if no data batch
    completed within the deadline)."""
    dim = spark.createDataFrame(
        [(f"LOC_{i}", 1_000_000 + i, "EU") for i in range(50)],
        "location string, population long, continent string",
    )

    # Rate source stands in for Kafka: same downstream pipeline, no broker.
    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .load()
        .select(
            F.col("timestamp").alias("event_time"),
            F.concat(F.lit("LOC_"), (F.col("value") % 50).cast("string")).alias("location"),
            (F.col("value") % 1000).cast("int").alias("new_cases"),
            (F.col("value") % 100000).cast("int").alias("total_cases"),
        )
    )
    enriched = windowed_enrichment(dim)(events)

    query = (
        enriched.writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_bench_out")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sb-ckpt-"))
        .start()
    )
    # The first micro-batch pays all the one-time costs (state init,
    # codegen) and ingests 0 rows; measure steady state from the batches
    # that actually carry data, using their own reported durations.
    deadline = time.time() + run_seconds
    data_batches: dict[str, dict] = {}
    while time.time() < deadline:
        time.sleep(2)
        for p in query.recentProgress:
            p = json.loads(p) if isinstance(p, str) else p
            if p["numInputRows"] > 0:
                data_batches[p["batchId"]] = p
        if len(data_batches) >= 5:
            break
    query.stop()
    total_in = sum(p["numInputRows"] for p in data_batches.values())
    total_ms = sum(p["durationMs"]["triggerExecution"] for p in data_batches.values())
    rows_per_sec = round(total_in / (total_ms / 1000.0), 1) if total_ms else 0.0
    # State-store health from the last data batch: rows held and bytes
    # used by the windowed aggregation. With the 10-minute watermark the
    # row count is bounded (~windows-in-horizon x keys) no matter how
    # long the stream runs — tests/test_state_store.py proves the
    # plateau; this records the measured steady-state size per round.
    state: dict = {}
    if data_batches:
        last = data_batches[max(data_batches)]
        ops = last.get("stateOperators") or []
        if ops:
            state = {
                "state_rows": int(ops[0].get("numRowsTotal", 0)),
                "state_memory_bytes": int(ops[0].get("memoryUsedBytes", 0)),
            }
    return {
        "metric": "stream_rows_per_sec",
        "value": rows_per_sec,
        "unit": "rows/sec",
        "offered_rate": rate,
        "run_seconds": run_seconds,
        "n_batches": len(data_batches),
        "total_rows": int(total_in),
        **state,
    }


def main() -> None:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    run_seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 90

    from data_pipeline_with_spark_kafka_spark.session import get_spark

    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(measure(spark, rate, run_seconds)))
    spark.stop()


if __name__ == "__main__":
    main()
