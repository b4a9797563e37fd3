"""SparkSession factory.

Single place that pins the session configuration (the reference spreads it
across ``spark_consumer_kafka.py:18-23`` and ``spark_consumer_dag.py:40-45``
with version skew; here it is one function):

- AQE on (runtime partition coalescing, skew-join handling, join re-plan),
- shuffle partitions sized to the actual parallelism, not a blanket 200
  (the reference hard-codes 200 for a 2-core cluster),
- UTC session timezone so timestamp semantics match the DuckDB oracle,
- Arrow enabled for any pandas interchange (vectorized, not per-row py4j),
- ``spark.sql.legacy.parquet.nanosAsLong`` because the test corpus carries
  nanosecond parquet timestamps that Spark's TimestampType (microsecond)
  cannot ingest natively; sources/tables.py converts ns->us explicitly.

At cluster scale the same factory applies: only ``master``/memory change,
and those are environment-driven.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "data-pipeline-with-spark-kafka-spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    cpus = default_parallelism()
    if shuffle_partitions is None:
        # Local mode: one shuffle partition per core avoids task-scheduling
        # overhead dominating small stages; AQE coalesces further at runtime.
        # On a real cluster this is overridden to ~2-3x total cores.
        shuffle_partitions = max(cpus, 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
