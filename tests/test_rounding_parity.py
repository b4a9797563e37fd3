"""Property test for the cross-engine rounding contract: `round_to` in
Spark must agree bit-for-bit with DuckDB's ROUND on arbitrary doubles —
including the .5-ulp boundary cases that broke plain F.round (see
functions/rounding.py)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to


def test_round_to_matches_duckdb_on_random_and_adversarial_doubles(spark, duck):
    rng = np.random.RandomState(7)
    values = list(rng.uniform(-1e6, 1e6, 3000))
    # adversarial: exact .5 boundaries at scale 4, tiny, huge, negative
    values += [x + 0.00005 for x in range(100)]
    values += [-x - 0.00005 for x in range(100)]
    values += [0.0, 1e-12, -1e-12, 123456789.000049999, 0.600250000000001]

    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(values)], "id long, v double")
    spark_out = {
        r.id: r.r for r in df.select("id", round_to(F.col("v"), 4).alias("r")).collect()
    }

    duck.execute("CREATE OR REPLACE TEMP TABLE vals(id BIGINT, v DOUBLE)")
    duck.executemany("INSERT INTO vals VALUES (?, ?)", [(i, float(v)) for i, v in enumerate(values)])
    duck_out = {i: r for i, r in duck.execute("SELECT id, ROUND(v, 4) FROM vals").fetchall()}

    mismatches = [
        (i, values[i], spark_out[i], duck_out[i])
        for i in spark_out
        if spark_out[i] != duck_out[i]
    ]
    assert not mismatches, f"{len(mismatches)} rounding divergences; first: {mismatches[:3]}"
