"""Measure the heavy-hitters sketch payoff: Misra-Gries sketch + exact
candidate recount vs the naive full-domain ``groupBy(item).count()``.

The sketch's claim (operators/sketches.py) is that at 100-TB the item
domain is mostly singletons, so the naive aggregate shuffles (and must
hash-aggregate) the whole domain while the sketch shuffles at most
partitions x k summary rows plus the candidate recount. This tool puts
NUMBERS on that: a synthetic stream with a handful of phi-heavy items
over an ever-larger singleton tail, timed under both plans (identical
results, asserted).

    python tools/hh_payoff.py [n_distinct ...]   # default 1M / 4M / 16M

Measured finding (2026-08-14, local[32], recorded in BASELINE.md
"heavy-hitters payoff"): at <= 16M distinct on one box the naive JVM
hash-aggregate WINS on wall time (sketch 0.5-1.0x) — the in-memory local
shuffle is nearly free while the sketch pays one Arrow round-trip over
every row. The sketch is the right plan only where its bounds bind:
per-task aggregation memory O(k + arrow_batch) instead of
O(distinct-per-task), and shuffle rows O(P x k) instead of O(domain) —
i.e. network-bound clusters with domains too large for hash-agg spill
to stay healthy. Below that regime, use the naive aggregate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.sketches import heavy_hitters
from data_pipeline_with_spark_kafka_spark.session import get_spark

PHI = 0.01
N_HEAVY = 20
PARTS = 32


def stream(spark, n_distinct: int):
    """N_HEAVY items each owning ~phi*2 of the stream + an n_distinct
    singleton tail (the URL/typo-shaped domain the sketch exists for)."""
    # Each heavy item owns ~2*phi of the TOTAL stream: solve
    # r = 2*phi*(N_HEAVY*r + n_tail) for the per-item repetition count.
    heavy_reps = max(int(2 * PHI * n_distinct / (1 - 2 * PHI * N_HEAVY)), 2)
    heavy = (
        spark.range(N_HEAVY * heavy_reps)
        .select(F.concat(F.lit("hh"), (F.col("id") % N_HEAVY)).alias("item"))
    )
    tail = spark.range(n_distinct).select(F.concat(F.lit("t"), "id").alias("item"))
    return heavy.unionAll(tail).repartition(PARTS)


def naive(items):
    total = items.count()
    return (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > PHI * total)
        .select("item", "cnt")
    )


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = get_spark("hh-payoff")
    for n in sizes:
        items = stream(spark, n).persist()
        items.count()  # materialize the input so neither plan pays generation

        got_sketch = {(r.item, r.cnt) for r in heavy_hitters(items, "item", phi=PHI).select("item", "cnt").collect()}
        got_naive = {(r.item, r.cnt) for r in naive(items).collect()}
        assert got_sketch == got_naive, f"result divergence at n={n}"
        assert len(got_sketch) == N_HEAVY

        t_sketch = min(timed(heavy_hitters(items, "item", phi=PHI)) for _ in range(2))
        spark.catalog.clearCache()
        items.persist().count()
        t_naive = min(timed(naive(items)) for _ in range(2))
        print(
            json.dumps(
                {
                    "n_distinct_tail": n,
                    "sketch_sec": round(t_sketch, 3),
                    "naive_sec": round(t_naive, 3),
                    "speedup": round(t_naive / t_sketch, 2),
                }
            ),
            flush=True,
        )
        items.unpersist()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
