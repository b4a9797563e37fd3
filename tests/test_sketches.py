"""Misra-Gries heavy hitters: sketch guarantees + exactness of the
two-pass result + the bounded-shuffle plan shape."""

from __future__ import annotations

import collections
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators import sketches


def _skewed_items(spark, *, n_distinct=2000, n_heavy=5, reps_heavy=400, parts=8):
    """Synthetic stream whose domain (n_distinct) far exceeds the sketch
    size: a few heavy items + a long singleton tail."""
    heavy = [f"hh{i}" for i in range(n_heavy) for _ in range(reps_heavy)]
    tail = [f"t{i}" for i in range(n_distinct)]
    rows = [(x,) for x in heavy + tail]
    return spark.createDataFrame(rows, "item string").repartition(parts), heavy + tail


def test_mg_partials_bounded_and_superset(spark):
    k = 50
    items, universe = _skewed_items(spark)
    true = collections.Counter(universe)
    n = len(universe)

    partials = sketches.misra_gries_partials(items, "item", k).collect()
    per_part_items = collections.Counter()
    merged: dict[str, int] = {}
    total = 0
    for r in partials:
        if r.item is None:
            total += r.lb
        else:
            merged[r.item] = merged.get(r.item, 0) + r.lb
            per_part_items[r.item] += 1
    assert total == n

    # Summary size bound: each partition contributes at most k-1 items.
    n_parts = sum(1 for r in partials if r.item is None)
    n_item_rows = sum(1 for r in partials if r.item is not None)
    assert n_item_rows <= n_parts * (k - 1)

    # Lower bounds never exceed true counts; undercount <= n/k in total,
    # so every item with true count > n/k survives with a positive bound.
    for item, lb in merged.items():
        assert lb <= true[item]
    for item, c in true.items():
        if c > n / k:
            assert item in merged and merged[item] > 0, item


def test_heavy_hitters_exact_vs_counter(spark):
    phi = 0.05
    items, universe = _skewed_items(spark)
    true = collections.Counter(universe)
    n = len(universe)

    got = {r.item: (r.cnt, r.freq) for r in sketches.heavy_hitters(items, "item", phi=phi).collect()}
    want = {i: c for i, c in true.items() if c > phi * n}
    assert set(got) == set(want)
    for item, c in want.items():
        assert got[item][0] == c
        assert got[item][1] == pytest.approx(c / n, abs=1e-6)


def test_heavy_hitters_small_k_still_exact(spark):
    # Force k far below the domain size: candidates get pruned hard but
    # the guarantee (k >= 1/phi) keeps every phi-heavy item.
    phi = 0.05
    items, universe = _skewed_items(spark, n_distinct=5000)
    true = collections.Counter(universe)
    n = len(universe)
    k = max(int(math.ceil(1.0 / phi)) + 1, 2)  # minimum that still guarantees

    got = {r.item for r in sketches.heavy_hitters(items, "item", phi=phi, k=k).collect()}
    want = {i for i, c in true.items() if c > phi * n}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from([f"w{i}" for i in range(40)]), min_size=1, max_size=400),
    st.sampled_from([0.02, 0.05, 0.2]),
)
def test_heavy_hitters_property_exact(spark, stream, phi):
    """Arbitrary streams (skewed by construction of sampled_from): the
    two-pass result is EXACTLY the > phi*n set, whatever the partitioning."""
    true = collections.Counter(stream)
    n = len(stream)
    items = spark.createDataFrame([(x,) for x in stream], "item string").repartition(4)
    got = {r.item: r.cnt for r in sketches.heavy_hitters(items, "item", phi=phi).collect()}
    want = {i: c for i, c in true.items() if c > phi * n}
    assert got == want


def test_heavy_hitters_phi_validation(spark):
    items, _ = _skewed_items(spark, n_distinct=10)
    with pytest.raises(ValueError):
        sketches.heavy_hitters(items, "item", phi=0.0)
    with pytest.raises(ValueError):
        sketches.heavy_hitters(items, "item", phi=1.5)


def test_heavy_hitters_plan_broadcasts_candidates(spark, sf_dir):
    """The recount pass must broadcast the candidate set (never shuffle the
    full token stream against it). The candidate relation carries no
    explicit hint (its <= P*k bound is runtime knowledge, per the
    de-hinting discipline), so the broadcast is AQE-elected — assert it
    on the FINAL adaptive plan after execution."""
    from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    df = sketches.heavy_hitters(toks, "token", phi=0.033)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
