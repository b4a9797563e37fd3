"""Runtime filtering at scan time: dynamic partition pruning (DPP) and
runtime bloom-filter injection.

At 100 TB these two optimizer features are the difference between
scanning a year and scanning a day: a selective dimension filter is
turned into (a) a partition filter on the fact scan (DPP, when the fact
is partitioned on the join key) or (b) a bloom semi-filter applied
before the shuffle (when it is not). Both are planner features — the
engine's job is to keep plans in the shapes that LET them fire, which
is what these tests pin down.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def fact_dir(spark, tmp_path):
    path = str(tmp_path / "fact_by_type")
    (
        spark.range(0, 5000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 5).cast("string").alias("ptype"),
            (F.col("id") * 2.0).alias("v"),
        )
        .write.mode("overwrite")
        .partitionBy("ptype")
        .parquet(path)
    )
    return path


def test_dynamic_partition_pruning_fires(spark, fact_dir):
    """Join on the PARTITION column with a selectively filtered dim:
    the fact scan must carry a dynamicpruning expression — at scale
    this skips every non-matching partition directory without a
    manual predicate."""
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("1", "keep"), ("3", "keep"), ("7", "other")], "ptype string, tag string"
    ).filter(F.col("tag") == "keep")
    joined = fact.join(dim, "ptype").groupBy("ptype").agg(F.sum("v").alias("sv"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruning actually bounds the result (the partition column
    # reads back type-inferred as int — compare canonicalized)
    assert {str(r.ptype) for r in joined.collect()} == {"1", "3"}


def test_runtime_bloom_filter_injected_on_shuffle_join(spark, fact_dir):
    """With broadcast off (the 100-TB fact-fact shape), a selective
    filter on one side should inject a bloom might_contain filter into
    the other side's scan stage. Thresholds are lowered because the
    fixture is tiny; the assertion is about plan SHAPE."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_dir)
        # non-partition join key -> DPP cannot fire; bloom filter is the
        # remaining runtime filter
        sel = spark.read.parquet(fact_dir).filter(F.col("v") < 20.0).select("k", "v")
        joined = fact.join(sel, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_might_contain" in plan.lower() or "bloomfilter" in plan.lower(), plan
        assert joined.count() == 10
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
