"""Chunking operator edges (the registered query's DuckDB oracle pins the
bulk case; these pin boundaries and the no-shuffle plan contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.chunking import chunk_documents


def chunks_of(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "id int, text string")
    return sorted(
        (r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, "id", "text", **kw).collect()
    )


def test_short_doc_is_one_chunk(spark):
    assert chunks_of(spark, "a b c", size=8, stride=4) == [(0, "a b c", 3)]


def test_exact_fit_is_one_chunk(spark):
    assert chunks_of(spark, "a b c d", size=4, stride=2) == [(0, "a b c d", 4)]


def test_stride_windows_cover_tail(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = chunks_of(spark, text, size=4, stride=2)
    # starts 0,2,4,6: last window reaches token 10 — full coverage, and
    # every token appears in at least one chunk.
    assert [c[0] for c in got] == [0, 1, 2, 3]
    assert got[-1] == (3, "t6 t7 t8 t9", 4)
    covered = set()
    for _, txt, _ in got:
        covered.update(txt.split())
    assert covered == set(text.split())


def test_short_tail_window_not_padded(spark):
    text = " ".join(f"t{i}" for i in range(11))
    got = chunks_of(spark, text, size=4, stride=2)
    assert got[-1] == (4, "t8 t9 t10", 3)  # short tail kept, not padded


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], "id int, text string")
    with pytest.raises(ValueError, match="size"):
        chunk_documents(df, "id", "text", size=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, "id", "text", size=4, stride=5)


def test_no_shuffle_in_plan(spark, sf_dir):
    from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

    out = chunk_documents(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
