"""Physical data layout: partitioned and bucketed writers (SURVEY.md §7
step 5 — the storage side of the 100 TB design).

- ``write_partitioned``: directory partitioning on low-cardinality columns
  -> partition pruning at scan time (WHERE on the partition column never
  touches other directories).
- ``write_bucketed``: hash-bucketed + sorted table in the session catalog.
  Two tables bucketed by the same key into the same bucket count join
  WITHOUT a shuffle — the single biggest lever for repeated fact-fact
  joins (tests assert the Exchange-free plan).
- ``repartition_for_output``: target-file-size repartition before a write
  (too many tiny files kills the next scan's task scheduling; too few
  kills parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    *,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def repartition_for_output(df: DataFrame, *, target_partitions: int) -> DataFrame:
    """Explicit output-width control before a write (coalesce when shrinking
    — no shuffle; repartition when growing)."""
    current = df.rdd.getNumPartitions()
    if target_partitions < current:
        return df.coalesce(target_partitions)
    if target_partitions > current:
        return df.repartition(target_partitions)
    return df
