"""Measure the skewed-join mitigation crossover: plain SMJ vs AQE
skew-split vs manual salting (round-5 verdict task #5).

Skewed joins are the top real-world 100-TB failure mode; the repo carries
both mitigations (AQE skew-join handling via session defaults, and
``operators/skew.salted_join`` for the cases AQE can't reach). This tool
puts NUMBERS on the choice: a fact table whose hot key owns 90% of rows
joins a 1000-key dim (broadcast disabled — the regime where skew
matters; a broadcastable dim never has the problem) under three plans:

- ``plain``: AQE skew handling OFF — the one-straggler-task baseline.
- ``aqe``:   AQE skew-split ON (thresholds scaled to the test data the
             same way a 100-TB deployment scales them to executor
             memory: threshold ~ a few advisory partition sizes).
- ``salted``: ``salted_join`` (8 buckets), AQE skew handling OFF.

    python tools/skew_crossover.py [rows ...]   # default 5M and 20M

Results + when-to-salt guidance live in BASELINE.md ("skew crossover").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from data_pipeline_with_spark_kafka_spark.operators.skew import salted_join
from data_pipeline_with_spark_kafka_spark.session import get_spark

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB",
}


def gen(spark, root: str, n_rows: int) -> tuple[str, str]:
    fact_path = os.path.join(root, f"fact_{n_rows}")
    dim_path = os.path.join(root, "dim")
    (
        spark.range(0, n_rows)
        .select(
            # 90% of rows share key 0; the rest spread over 1000 keys
            F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        .write.mode("overwrite")
        .parquet(fact_path)
    )
    if not os.path.isdir(dim_path):
        spark.range(0, 1000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim-"), F.col("id")).alias("name"),
        ).write.mode("overwrite").parquet(dim_path)
    return fact_path, dim_path


def timed(build, spark) -> float:
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [5_000_000, 20_000_000]
    spark = get_spark("skew-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    root = tempfile.mkdtemp(prefix="skewx-")
    try:
        for n_rows in sizes:
            fact_path, dim_path = gen(spark, root, n_rows)
            fact = lambda: spark.read.parquet(fact_path)  # noqa: E731
            dim = lambda: spark.read.parquet(dim_path)  # noqa: E731

            def with_skew_conf(on: bool):
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())
                for k, v in SKEW_CONFS.items():
                    if k != "spark.sql.adaptive.skewJoin.enabled":
                        if on:
                            spark.conf.set(k, v)
                        else:
                            spark.conf.unset(k)

            out = {"rows": n_rows}
            with_skew_conf(False)
            out["plain_smj_sec"] = min(
                timed(lambda: fact().join(dim(), "k"), spark),
                timed(lambda: fact().join(dim(), "k"), spark),
            )
            # Bucket count must cover the executor slot count: B buckets
            # split the hot key into at most B tasks, so B < slots leaves
            # cores idle behind the stragglers (measured: 8 buckets 3.9 s
            # vs 32 buckets 2.4 s on 32 slots at 20M rows).
            from data_pipeline_with_spark_kafka_spark.session import default_parallelism

            buckets = max(8, default_parallelism())
            out["salted_sec"] = min(
                timed(lambda: salted_join(fact(), dim(), "k", salt_buckets=buckets), spark),
                timed(lambda: salted_join(fact(), dim(), "k", salt_buckets=buckets), spark),
            )
            out["salt_buckets"] = buckets
            with_skew_conf(True)
            out["aqe_split_sec"] = min(
                timed(lambda: fact().join(dim(), "k"), spark),
                timed(lambda: fact().join(dim(), "k"), spark),
            )
            print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
