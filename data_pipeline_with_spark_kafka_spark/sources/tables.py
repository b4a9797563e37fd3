"""Batch table catalog over the driver-provided parquet fixtures.

Mirrors the reference's "static dimension load" step
(``spark_consumer_kafka.py:28-42``: JDBC scan -> project/cast -> cache)
generalized to the full TPC-H-ish fixture set in ``/root/testdata/sf*``.

Scale notes (100 TB design):
- parquet scans stay fully declarative so Catalyst pushes filters and
  prunes columns into the scan (verify with ``.explain``: PushedFilters /
  ReadSchema);
- no eager ``.cache()`` here -- caching a 100 TB fact table is a bug.
  Callers broadcast/cache *small dims* explicitly where a plan reuses
  them (see queries/flagship.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing types.

    ``events.ts`` is nanosecond-precision in parquet, which Spark's
    microsecond TimestampType cannot read natively; the session reads it
    as a raw long (``spark.sql.legacy.parquet.nanosAsLong``) and we
    truncate ns -> us here (``ts div 1000``), matching DuckDB's
    ``CAST(ts_ns AS TIMESTAMP)`` truncation semantics exactly.
    """
    if name == "events":
        # The driver may hand us a session without this conf; it is a
        # runtime-settable SQL conf, so set it defensively before the scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_temp_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Expose fixtures as SQL temp views (for spark.sql-surface queries)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
