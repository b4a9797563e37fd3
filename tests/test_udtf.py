"""Python UDTF surface (operators/udtf_ops.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_pipeline_with_spark_kafka_spark.operators.udtf_ops import (
    SentenceSpans,
    sentence_spans_table,
)


def test_udtf_direct_invocation(spark):
    rows = sentence_spans_table(spark, "Hello world. How are you? Fine!").collect()
    assert [(r.sentence, r.start_pos, r.end_pos, r.n_tokens) for r in rows] == [
        ("Hello world.", 0, 12, 2),
        ("How are you?", 13, 25, 3),
        ("Fine!", 26, 31, 1),
    ]


def test_udtf_lateral_join_over_relation(spark):
    """The table-function shape: LATERAL join a UDTF against a relation
    (one input row -> N typed output rows, SQL-addressable)."""
    spark.udtf.register("sentence_spans", SentenceSpans)
    docs = spark.createDataFrame(
        [(1, "A b. C d e."), (2, "No terminator here"), (3, None)],
        "id int, body string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT d.id, s.sentence, s.start_pos, s.n_tokens "
        "FROM udtf_docs d, LATERAL sentence_spans(d.body) s"
    ).collect()
    got = {(r.id, r.sentence, r.start_pos, r.n_tokens) for r in out}
    assert got == {
        (1, "A b.", 0, 2),
        (1, "C d e.", 5, 3),
        (2, "No terminator here", 0, 3),
    }


def test_udtf_offsets_address_original_string(spark):
    text = "  Padded start. And   spaced!  "
    rows = sentence_spans_table(spark, text).collect()
    for r in rows:
        assert text[r.start_pos : r.end_pos] == r.sentence
