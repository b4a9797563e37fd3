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


def zorder_key(cols: list, *, bits: int = 16):
    """Z-order (Morton) interleave of N numeric columns into one sortable
    long — pure codegen expressions, no UDF.

    Each column is first normalized to a ``bits``-wide integer rank by the
    caller (see ``write_zordered``, which uses ``ntile``); this function
    interleaves their bits: key = x0_b0 y0_b0 x0_b1 y0_b1 ... Sorting by
    the interleaved key places rows close in EVERY dimension into the same
    files, so parquet min/max stats prune multi-dimension range predicates
    — the effect Delta/Iceberg OPTIMIZE ZORDER achieves, built from
    ``shiftleft``/``shiftright``/``bitwise OR`` on a plain parquet layout.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    *,
    bits: int = 10,
    target_partitions: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on a Z-order curve over ``zorder_cols``.

    Ranks each column into 2^bits quantile buckets (``ntile`` windows —
    rank-based, so skewed value distributions still spread evenly over the
    curve), interleaves the rank bits into a Morton key, range-partitions
    on the key, and sorts within partitions. Files then hold
    hyper-rectangles of the value space: a scan filtering on ANY of the
    z-ordered columns skips most files on parquet min/max stats alone —
    single-column sort achieves this for only its leading column.

    One shuffle (the range partition); the ntile windows are global sorts
    of (column) pairs — at 100 TB swap ntile for approx-quantile bucket
    boundaries (one pass, no sort) computed once and joined in; the curve
    and write path stay identical.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ranked = df
    rank_cols = []
    for c in zorder_cols:
        rc = f"_zr_{c}"
        ranked = ranked.withColumn(
            rc, (F.ntile(1 << bits).over(Window.orderBy(F.col(c))) - 1).cast("long")
        )
        rank_cols.append(rc)
    keyed = ranked.withColumn("_zkey", zorder_key([F.col(rc) for rc in rank_cols], bits=bits))
    (
        keyed.repartitionByRange(target_partitions, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *rank_cols)
        .write.mode(mode)
        .parquet(path)
    )


def repartition_for_output(df: DataFrame, *, target_partitions: int) -> DataFrame:
    """Explicit output-width control before a write (coalesce when shrinking
    — no shuffle; repartition when growing)."""
    current = df.rdd.getNumPartitions()
    if target_partitions < current:
        return df.coalesce(target_partitions)
    if target_partitions > current:
        return df.repartition(target_partitions)
    return df


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    out_path: str,
    *,
    target_file_bytes: int = 128 << 20,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` right-sized files.

    The operational op every long-running ingest needs — streaming
    micro-batches and fine-grained partitions accrete thousands of
    KB-scale files, and at 100 TB the scan cost becomes task-scheduling
    overhead + footer reads instead of IO. Sizing uses the Hadoop
    FileSystem API (portable across HDFS/S3A/local, and the same listing
    a real lakehouse compactor uses), so the byte count is the on-disk
    parquet size, not a row estimate.

    Writes to ``out_path`` (never in place: a failed in-place rewrite
    would destroy the source; callers swap directories after success —
    the same two-phase discipline as the JDBC staging upsert). Returns
    {files_before, bytes_before, files_after}.
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    statuses = [
        s for s in fs.listStatus(p)
        if s.isFile() and not s.getPath().getName().startswith("_")
    ]
    files_before = len(statuses)
    bytes_before = sum(s.getLen() for s in statuses)
    n_out = max(1, math.ceil(bytes_before / target_file_bytes))

    df = spark.read.parquet(path)
    # coalesce, not repartition: shrinking file count needs no shuffle —
    # tasks read several source files each and write one output.
    df.coalesce(n_out).write.mode("overwrite").parquet(out_path)

    out_p = jvm.org.apache.hadoop.fs.Path(out_path)
    files_after = len([
        s for s in fs.listStatus(out_p)
        if s.isFile() and s.getPath().getName().endswith(".parquet")
    ])
    return {
        "files_before": files_before,
        "bytes_before": int(bytes_before),
        "files_after": files_after,
    }
