"""Hand-built fixtures for the repetition operators: the segmenter's edge
cases (tail clip, empty doc), the Gopher metric math, and the C4-style
first-occurrence election — all checked against values computed by hand."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_pipeline_with_spark_kafka_spark.operators.repetition import (
    dedup_corpus_segments,
    repetition_metrics,
    segments,
)
from data_pipeline_with_spark_kafka_spark.operators.text import tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segments_tail_clips_and_empty_is_empty(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e f g"),  # width 3 -> [a b c][d e f][g]
            (2, ""),  # split('') == [''] in Spark AND DuckDB -> one empty segment
            (3, "x"),  # single short segment
        ],
    ).select("doc_id", segments(tokens(F.col("text")), 3).alias("segs"))
    got = {r.doc_id: r.segs for r in df.collect()}
    assert got[1] == ["a b c", "d e f", "g"]
    assert got[2] == [""]
    assert got[3] == ["x"]


def test_repetition_metrics_hand_computed(spark):
    # width 2 segments of doc 1: [a b][a b][c d] -> 3 segs, "a b" dup'd.
    # dup_seg_frac = 2/3; seg_chars = 3+3+3 = 9, dup chars 6 -> 2/3.
    # bigrams: (a b) x2, (b a), (b c), (c d) -> top = 2*3=6 chars / 11 text chars.
    # 5-grams: "a b a b c" , "b a b c d" -> 2 distinct, none dup'd.
    df = _docs(spark, [(1, "a b a b c d")])
    row = repetition_metrics(df, width=2).collect()[0]
    assert row.n_segs == 3
    assert row.dup_seg_frac == pytest.approx(round(2 / 3, 4))
    assert row.dup_seg_char_frac == pytest.approx(round(6 / 9, 4))
    assert row.top_bigram_char_frac == pytest.approx(round(6 / 11, 4))
    assert row.dup_5gram_frac == 0.0


def test_repetition_metrics_short_doc_no_grams(spark):
    """A 1-token doc has no bigrams/5-grams; fractions coalesce to 0."""
    row = repetition_metrics(_docs(spark, [(1, "hello")]), width=2).collect()[0]
    assert row.n_segs == 1
    assert row.dup_seg_frac == 0.0
    assert row.top_bigram_char_frac == 0.0
    assert row.dup_5gram_frac == 0.0


def test_dedup_corpus_segments_first_occurrence_wins(spark):
    # width 2: doc1 = [a b][c d], doc2 = [a b][e f], doc3 = [c d]
    # "a b" first at (1,0); "c d" first at (1,1); doc2 keeps only [e f];
    # doc3 loses its only segment -> empty text survives with n_kept=0.
    df = _docs(spark, [(1, "a b c d"), (2, "a b e f"), (3, "c d")])
    got = {r.doc_id: r for r in dedup_corpus_segments(df, width=2).collect()}
    assert got[1].text_clean == "a b c d" and got[1].n_kept == 2 and got[1].n_removed == 0
    assert got[2].text_clean == "e f" and got[2].n_kept == 1 and got[2].n_removed == 1
    assert got[3].text_clean == "" and got[3].n_kept == 0 and got[3].n_removed == 1


def test_dedup_corpus_segments_intra_doc_dup_removed(spark):
    """Repetition inside one doc is also collapsed to the first position."""
    df = _docs(spark, [(7, "a b a b a b")])
    row = dedup_corpus_segments(df, width=2).collect()[0]
    assert row.text_clean == "a b" and row.n_kept == 1 and row.n_removed == 2


def test_dedup_corpus_segments_reassembles_in_position_order(spark):
    """Survivor ordering comes from sort_array over positions, not from
    collect_list's arrival order — verify with >2 surviving segments."""
    df = _docs(spark, [(1, "s0 s0 s1 s1 s2 s2 s3 s3 s4 s4")])
    row = dedup_corpus_segments(df, width=2).collect()[0]
    assert row.text_clean == "s0 s0 s1 s1 s2 s2 s3 s3 s4 s4"
    df2 = _docs(spark, [(1, "a a b b c c"), (2, "b b a a d d c c")])
    got = {r.doc_id: r for r in dedup_corpus_segments(df2, width=2).collect()}
    assert got[1].text_clean == "a a b b c c"
    assert got[2].text_clean == "d d"


def test_remove_repeated_spans_hand_computed(spark):
    from data_pipeline_with_spark_kafka_spark.operators.repetition import (
        remove_repeated_spans,
    )

    shared = "s1 s2 s3 s4"  # 4-token span shared by docs 1 and 2
    df = _docs(
        spark,
        [
            (1, f"a b {shared} c d"),
            (2, f"x {shared} y z"),
            (3, "p q r"),            # shorter than k -> untouched
            (4, "m m m m m m"),      # self-repetition only -> untouched
        ],
    )
    got = {r.doc_id: r for r in remove_repeated_spans(df, "doc_id", "text", k=4).collect()}
    # Every token covered by the shared 4-gram is dropped from BOTH docs.
    assert got[1].cleaned_text == "a b c d" and got[1].n_removed == 4
    assert got[2].cleaned_text == "x y z" and got[2].n_removed == 4
    assert got[3].cleaned_text == "p q r" and got[3].n_removed == 0
    # k-grams repeat WITHIN doc 4 but in no other doc: distinct-doc count
    # is 1, so nothing is removed.
    assert got[4].cleaned_text == "m m m m m m" and got[4].n_removed == 0


def test_remove_repeated_spans_overlapping_runs_merge(spark):
    from data_pipeline_with_spark_kafka_spark.operators.repetition import (
        remove_repeated_spans,
    )

    # Docs share a 5-token run; with k=4 the two overlapping shared
    # 4-grams cover the whole run in both docs (run-merge via coverage).
    df = _docs(spark, [(1, "a b c d e x"), (2, "y a b c d e")])
    got = {r.doc_id: r for r in remove_repeated_spans(df, "doc_id", "text", k=4).collect()}
    assert got[1].cleaned_text == "x" and got[1].n_removed == 5
    assert got[2].cleaned_text == "y" and got[2].n_removed == 5


def test_remove_repeated_spans_identical_docs_empty_out(spark):
    from data_pipeline_with_spark_kafka_spark.operators.repetition import (
        remove_repeated_spans,
    )

    text = " ".join(f"t{i}" for i in range(6))
    df = _docs(spark, [(1, text), (2, text)])
    got = {r.doc_id: r for r in remove_repeated_spans(df, "doc_id", "text", k=4).collect()}
    assert got[1].cleaned_text == "" and got[1].n_removed == 6
    assert got[2].cleaned_text == "" and got[2].n_removed == 6
