"""Incremental dedup: Bloom-relation properties (bounded size, no false
negatives) and prefilter==exact equivalence on the fixture corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.incremental import (
    bloom_build,
    bloom_might_contain,
    fingerprints,
    incremental_novel,
)
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table


def split_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    half = docs.agg(F.floor(F.max("doc_id") / 2).cast("long").alias("half"))
    both = docs.crossJoin(F.broadcast(half))
    return (
        both.filter(F.col("doc_id") >= F.col("half")).drop("half"),
        both.filter(F.col("doc_id") < F.col("half")).drop("half"),
    )


def test_bloom_relation_is_bounded_by_m_bits(spark, sf_dir):
    _, known = split_docs(spark, sf_dir)
    m_bits = 1 << 12
    bloom = bloom_build(fingerprints(known, "doc_id", "text").select("fp", "fp2"), m_bits=m_bits)
    n = bloom.count()
    assert n <= m_bits // 64
    # every mask word is within range
    assert bloom.filter((F.col("word") < 0) | (F.col("word") >= m_bits // 64)).count() == 0


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every fingerprint that was inserted must report might_contain=true
    when probed — the Bloom guarantee the exactness proof rests on."""
    _, known = split_docs(spark, sf_dir)
    kfp = fingerprints(known, "doc_id", "text")
    bloom = bloom_build(kfp.select("fp", "fp2"), m_bits=1 << 16)
    probed = bloom_might_contain(kfp, bloom, m_bits=1 << 16)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_prefilter_equals_exact(spark, sf_dir):
    batch, known = split_docs(spark, sf_dir)
    exact = incremental_novel(batch, known, "doc_id", "text", prefilter=False)
    fast = incremental_novel(batch, known, "doc_id", "text", prefilter=True)
    a = sorted(r.doc_id for r in exact.select("doc_id").collect())
    b = sorted(r.doc_id for r in fast.select("doc_id").collect())
    assert a == b and len(a) > 0


def test_prefilter_equals_exact_under_tiny_bloom(spark, sf_dir):
    """A deliberately saturated Bloom (256 bits) forces near-100% false
    positives — the result must STILL be exact, just without the skip."""
    batch, known = split_docs(spark, sf_dir)
    exact = incremental_novel(batch, known, "doc_id", "text", prefilter=False)
    fast = incremental_novel(batch, known, "doc_id", "text", prefilter=True, m_bits=256, k=2)
    assert sorted(r.doc_id for r in exact.select("doc_id").collect()) == sorted(
        r.doc_id for r in fast.select("doc_id").collect()
    )


def test_rejects_unaligned_m_bits(spark, sf_dir):
    _, known = split_docs(spark, sf_dir)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(fingerprints(known, "doc_id", "text"), m_bits=100)


def test_bloom_probe_side_is_broadcast(spark, sf_dir):
    """Plan discipline: the bloom relation joins as a broadcast (bounded by
    m_bits), never a shuffle of the batch against it."""
    batch, known = split_docs(spark, sf_dir)
    novel = incremental_novel(batch, known, "doc_id", "text", prefilter=True)
    plan = novel._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
