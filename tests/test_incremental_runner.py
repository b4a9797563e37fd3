"""Ledger-driven incremental batch runner (orchestration/incremental_runner):
first run processes everything, reruns no-op, new partitions process alone,
a crash before the ledger append retries, and the pruned read reaches the
file index as a PartitionFilter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.orchestration.incremental_runner import (
    run_incremental,
)


@pytest.fixture()
def partitioned_src(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", float(i)) for i in range(30)], "id long, dt string, v double"
    )
    df.write.partitionBy("dt").parquet(src)
    return src


def test_incremental_processes_then_noops(spark, tmp_path, partitioned_src):
    ledger = str(tmp_path / "ledger")
    out = str(tmp_path / "out")
    seen: list = []

    def process(df, parts):
        seen.append(sorted(parts))
        df.write.mode("append").parquet(out)

    first = run_incremental(spark, partitioned_src, "dt", ledger, process)
    assert sorted(first) == ["d0", "d1", "d2"]
    assert spark.read.parquet(out).count() == 30

    second = run_incremental(spark, partitioned_src, "dt", ledger, process)
    assert second == [] and len(seen) == 1, "rerun must be a no-op"

    # a NEW partition arrives -> only it is handed to process()
    spark.createDataFrame([(100, "d9", 1.0)], "id long, dt string, v double").write.mode(
        "append"
    ).partitionBy("dt").parquet(partitioned_src)
    third = run_incremental(spark, partitioned_src, "dt", ledger, process)
    assert third == ["d9"]
    assert seen[-1] == ["d9"]
    assert spark.read.parquet(out).count() == 31


def test_crash_before_ledger_append_retries(spark, tmp_path, partitioned_src):
    ledger = str(tmp_path / "ledger")

    def boom(df, parts):
        raise RuntimeError("crash mid-processing")

    with pytest.raises(RuntimeError):
        run_incremental(spark, partitioned_src, "dt", ledger, boom)

    # ledger untouched -> the retry sees the same work
    handled: list = []
    retried = run_incremental(
        spark, partitioned_src, "dt", ledger, lambda df, p: handled.extend(p)
    )
    assert sorted(retried) == ["d0", "d1", "d2"]


def test_pruned_read_has_partition_filters(spark, tmp_path, partitioned_src):
    """The todo filter must prune at the LISTING level (PartitionFilters),
    not as a post-scan row filter."""
    captured: dict = {}

    def process(df, parts):
        captured["plan"] = df._jdf.queryExecution().executedPlan().toString()
        df.count()

    run_incremental(spark, partitioned_src, "dt", str(tmp_path / "ledger"), process)
    plan = captured["plan"]
    assert "PartitionFilters" in plan
    assert "dt" in plan.split("PartitionFilters")[1][:200], plan
