"""Measure the Z-order layout payoff: row-groups/files pruned and wall
time for selective scans over z-ordered vs unsorted parquet (round-5
verdict task #6 — keeps ``sources/layout.write_zordered`` honest as an
operator, not a checkbox).

Workload: the sf0.1 events table (500k rows) rewritten two ways —
shuffled-unsorted and z-ordered on (user_id, value) — then probed with
selective two-dimension box predicates (the case single-column sort can't
serve: it prunes only its leading column). Reports, per layout:

- parquet row-groups whose min/max stats overlap the predicate box
  (= what a stats-pruning scan must read), via pyarrow footer inspection;
- Spark wall time for the same filtered aggregate (min-of-2, noop sink).

    python tools/zorder_payoff.py

Results recorded in BASELINE.md ("z-order payoff").
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from data_pipeline_with_spark_kafka_spark.session import get_spark
from data_pipeline_with_spark_kafka_spark.sources.layout import write_zordered
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Selective boxes on both z-ordered dimensions (user_id in [0, 1500),
# value in [0, 560]; each box is ~1-2% x ~2-4% selectivity).
BOXES = [
    (0, 15, 0.0, 10.0),
    (700, 720, 50.0, 60.0),
    (1400, 1430, 200.0, 220.0),
]


def rowgroup_stats(path: str, lo_u, hi_u, lo_v, hi_v) -> tuple[int, int]:
    """(row groups overlapping the box, total row groups) from footers."""
    import pyarrow.parquet as pq

    overlap = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            su = g.column(names["user_id"]).statistics
            sv = g.column(names["value"]).statistics
            if su.min <= hi_u and su.max >= lo_u and sv.min <= hi_v and sv.max >= lo_v:
                overlap += 1
    return overlap, total


def timed_scan(spark, path: str, lo_u, hi_u, lo_v, hi_v) -> float:
    df = (
        spark.read.parquet(path)
        .filter(
            (F.col("user_id") >= lo_u) & (F.col("user_id") <= hi_u)
            & (F.col("value") >= lo_v) & (F.col("value") <= hi_v)
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("zorder-payoff")
    spark.sparkContext.setLogLevel("ERROR")
    # small row groups so stats granularity resembles a many-file table
    spark.conf.set("spark.sql.parquet.blockSize", str(256 * 1024))
    spark.sparkContext._jsc.hadoopConfiguration().setInt("parquet.block.size", 256 * 1024)
    root = tempfile.mkdtemp(prefix="zorder-")
    try:
        events = load_table(spark, SF_DIR, "events").select("user_id", "value", "event_type")
        plain_path = os.path.join(root, "plain")
        z_path = os.path.join(root, "zorder")
        # unsorted baseline: hash-shuffled so values scatter across files
        events.repartition(32, "event_type").write.mode("overwrite").parquet(plain_path)
        write_zordered(events, z_path, ["user_id", "value"], target_partitions=32)

        results = []
        for lo_u, hi_u, lo_v, hi_v in BOXES:
            po, pt = rowgroup_stats(plain_path, lo_u, hi_u, lo_v, hi_v)
            zo, zt = rowgroup_stats(z_path, lo_u, hi_u, lo_v, hi_v)
            t_plain = min(timed_scan(spark, plain_path, lo_u, hi_u, lo_v, hi_v) for _ in range(2))
            t_z = min(timed_scan(spark, z_path, lo_u, hi_u, lo_v, hi_v) for _ in range(2))
            results.append(
                {
                    "box": [lo_u, hi_u, lo_v, hi_v],
                    "plain_rowgroups": f"{po}/{pt}",
                    "zorder_rowgroups": f"{zo}/{zt}",
                    "skip_ratio_plain": round(1 - po / pt, 3),
                    "skip_ratio_zorder": round(1 - zo / zt, 3),
                    "plain_sec": round(t_plain, 3),
                    "zorder_sec": round(t_z, 3),
                }
            )
            print(json.dumps(results[-1]), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
