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

    The resulting DataFrame is memoized on the session (keyed by
    (sf_dir, name)) — a lightweight catalog. Besides avoiding repeated
    setup, this keeps query CONSTRUCTION job-free after the first load:
    ``spark.read.parquet`` runs one small schema-inference job per call,
    which would otherwise recur in every plan that touches the table.
    DataFrames are immutable plans, so sharing one per table is safe.
    """
    cache = spark.__dict__.setdefault("_graft_table_cache", {})
    key = (sf_dir, name)
    if key not in cache:
        if name == "events":
            # The driver may hand us a session without this conf; it is a
            # runtime-settable SQL conf, so set it defensively pre-scan.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        cache[key] = df
    return cache[key]


#: Fan-out ceiling: inputs at or under this many bytes scan as a single
#: task (one parquet row group under the default 128 MB
#: ``spark.sql.files.maxPartitionBytes``), serializing every downstream
#: per-row transform behind one core. Tunable per deployment; at real
#: scale the scan itself yields >= cluster parallelism partitions and the
#: fan-out never fires, so plans are unchanged.
FANOUT_MAX_BYTES = int(os.environ.get("SPARK_GRAFT_FANOUT_MAX_BYTES", 128 << 20))


def _table_bytes(sf_dir: str, name: str) -> int:
    """On-disk size of a fixture table (file or directory of parts).

    Directories are walked RECURSIVELY (round-13 advice fix): a
    partitioned/nested parquet layout has no top-level ``*.parquet``
    files, and the old flat glob summed it to 0 bytes — which would have
    told ``load_table_fanned`` to round-robin-shuffle an arbitrarily
    large table, the exact opposite of its 'plans unchanged at real
    scale' contract. An empty walk result is treated like the OSError
    branch: unknown -> assume big, never fan out."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        total = 0
        seen = False
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    seen = True
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        return FANOUT_MAX_BYTES
        return total if seen else FANOUT_MAX_BYTES
    try:
        return os.path.getsize(path)
    except OSError:
        return FANOUT_MAX_BYTES  # unknown -> assume big, never fan out


def load_table_fanned(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_table`` + round-robin fan-out for SMALL (single-scan-task)
    inputs feeding per-row-expensive transforms.

    A parquet file under ``spark.sql.files.maxPartitionBytes`` with one
    row group is unsplittable: the scan is ONE task, and every tokenize /
    shingle / hash / higher-order-function transform stacked on it runs
    single-threaded while the rest of the cluster idles (the
    optimization-guide §2.5 "input skew: one huge unsplittable file"
    case, at the small end). The remedy is the guide's own: repartition
    immediately after the read — the shuffle moves only the raw bytes
    (tiny by the same precondition that triggered it), and the expensive
    map work lands on every core. Measured at sf0.1: simhash fingerprints
    1.64 -> 0.33 s, bare tokenize+explode 1.15 -> 0.22 s.

    Scale-adaptive by construction: inputs over ``FANOUT_MAX_BYTES``
    (env ``SPARK_GRAFT_FANOUT_MAX_BYTES``) pass through untouched, so at
    100 TB the plan is identical to ``load_table``'s. The round-robin
    repartition is retry-safe (``spark.sql.execution.sortBeforeRepartition``
    stays on) and row-order-neutral for every consumer: all downstream
    aggregates/windows in this repo order explicitly.
    """
    df = load_table(spark, sf_dir, name)
    if _table_bytes(sf_dir, name) >= FANOUT_MAX_BYTES:
        return df
    cache = spark.__dict__.setdefault("_graft_table_fanout_cache", {})
    key = (sf_dir, name)
    if key not in cache:
        from data_pipeline_with_spark_kafka_spark.session import default_parallelism

        cache[key] = df.repartition(default_parallelism())
    return cache[key]


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from the parquet footer(s).

    Driver-side metadata read — the same class of IO Spark itself performs
    at planning time (file listing / schema read), NOT a Spark job. Used by
    queries that need a cheap cardinality bound to choose a plan shape
    without breaking the lazy-construction contract (e.g. the embedding
    near-dup guard decision)."""
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(p).num_rows
            for p in glob.glob(os.path.join(path, "*.parquet"))
        )
    return pq.read_metadata(path).num_rows


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_temp_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Expose fixtures as SQL temp views (for spark.sql-surface queries)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
