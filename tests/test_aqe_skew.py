"""AQE skew-join splitting: the runtime complement to the manual
salting in operators/skew.py. A join whose left side is dominated by
one hot key must come out of adaptive execution with the skewed
partition split (``skew=true`` in the final SMJ), not one straggler
task dragging the stage."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    # parquet inputs so size estimates are real (createDataFrame relations
    # report tiny in-memory sizes that defeat the byte thresholds)
    fact_path = str(tmp_path / "skew_fact")
    dim_path = str(tmp_path / "skew_dim")
    (
        spark.range(0, 200_000)
        .select(
            # 90% of rows share key 0; the rest spread over 1000 keys
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        .write.mode("overwrite")
        .parquet(fact_path)
    )
    spark.range(0, 1000).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("name")
    ).write.mode("overwrite").parquet(dim_path)

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = spark.read.parquet(fact_path).join(spark.read.parquet(dim_path), "k")
        # collect() executes THIS DataFrame's queryExecution — count()
        # would finalize a different (agg-wrapped) adaptive plan and
        # leave joined's own plan isFinalPlan=false.
        assert len(joined.collect()) == 200_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
