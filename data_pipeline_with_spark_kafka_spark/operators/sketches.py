"""Bounded-memory frequency sketches: Misra-Gries heavy hitters.

Why a sketch when ``groupBy(token).count()`` exists: at 100 TB the item
domain (tokens, URLs, user agents, n-grams) can be billions of mostly-
singleton values, and a full-vocabulary aggregate shuffles the entire
domain. The classic two-pass heavy-hitters shape bounds both memory and
shuffle no matter the cardinality:

1. **Sketch pass** — each partition folds its items through a Misra-Gries
   summary of at most ``k-1`` counters (``mapInPandas``, Arrow-batched;
   counters merge batch-wise with the standard mergeable-summaries
   shrink). The shuffle then carries at most ``partitions x (k-1)`` rows
   regardless of domain size. Merged lower bounds undercount true counts
   by at most ``n/k`` total, so every item with true count > ``n/k`` has a
   positive merged bound — with ``k >= 2/phi`` the candidate set provably
   contains every phi-heavy item (Misra & Gries 1982; Agarwal et al.,
   "Mergeable Summaries", PODS 2012).
2. **Exact recount pass** — only candidate items (a broadcast-sized set)
   are re-counted exactly; the final ``> phi * n`` filter is applied to
   exact counts. The result is therefore EXACTLY the set of phi-heavy
   items — deterministic and DuckDB-oracle-able — while the full domain is
   never aggregated.

When to use which (measured, tools/hh_payoff.py + BASELINE.md): on a
single box the naive ``groupBy(item).count()`` WINS on wall time even at
16M distinct items — local shuffle is nearly free and the sketch pays an
Arrow round-trip per row. Reach for the sketch when its bounds bind:
per-task aggregation memory O(k) instead of O(distinct-per-task), and
shuffle rows O(partitions x k) instead of O(domain) — the network-bound
cluster regime where a billions-wide singleton domain blows hash-agg
spill.

No counterpart in the 319-LoC reference (which has no frequency analysis);
this is part of the [EXT] training-data-pipeline surface.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to

_PARTIAL_SCHEMA = "item string, lb long"


def _mg_shrink(counters: dict[str, int], k: int) -> dict[str, int]:
    """Shrink a counter dict to at most ``k-1`` entries by subtracting the
    k-th largest count from every counter and dropping non-positives (the
    mergeable-summaries shrink; equivalent to repeated decrement-all)."""
    if len(counters) <= k - 1:
        return counters
    vals = sorted(counters.values(), reverse=True)
    sub = vals[k - 1]
    return {i: c - sub for i, c in counters.items() if c > sub}


def misra_gries_partials(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of the ``item_col`` stream.

    Returns ``(item, lb)`` rows — at most ``k-1`` per partition — plus one
    ``(NULL, n_p)`` row per partition carrying the partition's item count
    (so the caller gets the global ``n`` from the same single pass).
    Persistent memory per task is O(k + arrow_batch) whatever the domain
    cardinality: each Arrow batch (bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``) is value_counts'd,
    merged, and immediately shrunk back to ``k-1`` counters.
    """

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        total = 0
        for pdf in batches:
            vc = pdf["item"].dropna().value_counts()
            total += int(vc.sum())
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            counters = _mg_shrink(counters, k)
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "lb": list(counters.values()) + [total],
            }
        )

    return items.select(F.col(item_col).alias("item")).mapInPandas(fold, _PARTIAL_SCHEMA)


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    *,
    phi: float,
    k: int | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters (items with count > ``phi * n``) via
    sketch-then-recount. Output: ``(item, cnt, freq)``, exact.

    ``k`` defaults to ``ceil(2/phi)`` — twice the minimum that guarantees
    no phi-heavy item is lost to sketch undercount.
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    k = k if k is not None else max(int(math.ceil(2.0 / phi)), 2)

    # Persist: the merged summary (<= partitions x k rows) feeds both the
    # total-count scalar and the candidate set — without it the sketch
    # pass over the full corpus runs twice.
    merged = (
        misra_gries_partials(items, item_col, k)
        .groupBy("item")
        .agg(F.sum("lb").alias("lb"))
        .persist()
    )
    # The NULL-item group is the summed per-partition totals = global n.
    total = merged.filter(F.col("item").isNull()).select(F.col("lb").alias("n")).limit(1)
    candidates = merged.filter(F.col("item").isNotNull() & (F.col("lb") > 0)).select("item")

    exact = (
        items.select(F.col(item_col).alias("item"))
        # Candidate semi-join BEFORE the aggregate: the count shuffle
        # carries only candidate items, never the full domain. No explicit
        # broadcast hint — the candidate relation is runtime-bounded
        # (<= partitions x k rows) but Catalyst cannot prove that at plan
        # time, so per the de-hinting discipline AQE elects the broadcast
        # from the measured size (asserted in tests/test_sketches.py).
        .join(candidates, "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # 1-row scalar relation (limit(1) above bounds it structurally).
    return (
        exact.join(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n") * F.lit(phi))
        .select(
            "item",
            "cnt",
            round_to(F.col("cnt") / F.col("n"), 6).alias("freq"),
        )
    )
