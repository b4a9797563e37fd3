"""Audit metrics via CollectMetrics (plans/audit.py): in-job volume /
key-integrity / watermark observability with no second pass over the data.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.plans.audit import (
    with_batch_audit,
    with_streaming_audit,
)


def test_batch_audit_observation(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, k string"
    )
    observed, obs = with_batch_audit(df.filter(F.col("id") > 1), key_col="k")
    assert observed.count() == 3
    got = obs.get
    assert got["n_rows"] == 3
    assert got["null_k"] == 2


def test_batch_audit_adds_no_exchange(spark):
    df = spark.range(100).withColumn("k", F.col("id").cast("string"))
    plain = df.filter(F.col("id") > 5)
    audited, _obs = with_batch_audit(plain, key_col="k")
    n = lambda d: d._jdf.queryExecution().executedPlan().toString().count("Exchange")  # noqa: E731
    assert n(audited) == n(plain), "CollectMetrics must not add a shuffle"


def test_streaming_audit_observed_metrics(spark, tmp_path):
    src = tmp_path / "audit_src"
    src.mkdir()
    rows = [{"id": i, "k": None if i % 5 == 0 else f"k{i}", "ts": f"2024-01-01 00:{i:02d}:00"} for i in range(20)]
    (src / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("id long, k string, ts string")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    audited = with_streaming_audit(stream, "ingest_audit", key_col="k", ts_col="ts")
    q = (
        audited.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        metrics = None
        for p in q.recentProgress:
            om = p.get("observedMetrics") or {}
            if "ingest_audit" in om:
                metrics = om["ingest_audit"]
        assert metrics is not None, [p.get("observedMetrics") for p in q.recentProgress]
        assert metrics["n_rows"] == 20
        assert metrics["null_k"] == 4
        assert str(metrics["max_ts"]).startswith("2024-01-01 00:19")
    finally:
        if q.isActive:
            q.stop()
        deadline = time.time() + 30
        while q.isActive and time.time() < deadline:
            time.sleep(0.2)
