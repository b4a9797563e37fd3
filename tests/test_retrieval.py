"""Retrieval operators (operators/retrieval): postings exactness vs
collections.Counter, BM25 score-for-score vs a pure-Python reference,
unknown-term robustness, and the plan shape (postings-shuffle reuse,
partial top-k, no cartesian)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators import retrieval

CORPUS = [
    (0, "spark join spark shuffle"),
    (1, "join join join window"),
    (2, "window merge stream stream window"),
    (3, "spark"),
    (4, "scan filter scan filter scan"),
    (5, "spark join window merge stream scan filter"),
]

QUERIES = [
    (0, "spark join"),
    (1, "stream window"),
    (2, "unknownterm scan"),  # one term absent from the corpus entirely
    (3, "unknownterm ghost"),  # every term absent -> query yields no rows
]


def _bm25_reference(k1: float = 1.2, b: float = 0.75, k: int = 5):
    """Pure-Python BM25 over CORPUS/QUERIES (Lucene positive idf)."""
    docs = {doc_id: text.split() for doc_id, text in CORPUS}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    tf = {doc_id: Counter(toks) for doc_id, toks in docs.items()}
    df = Counter()
    for toks in docs.values():
        for term in set(toks):
            df[term] += 1
    out = {}
    for qid, qtext in QUERIES:
        scores = {}
        for doc_id, toks in docs.items():
            s = 0.0
            matched = False
            for term in qtext.split():
                f = tf[doc_id][term]
                if f == 0 or df[term] == 0:
                    continue
                matched = True
                idf = math.log(1 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
                dl = len(toks)
                s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
            if matched:
                scores[doc_id] = s
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )[:k]
        out[qid] = [(rank + 1, doc_id, score) for rank, (doc_id, score) in enumerate(ranked)]
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def qterms_df(spark):
    return spark.createDataFrame(
        [(qid, t) for qid, text in QUERIES for t in text.split()],
        "query_id int, term string",
    )


def test_term_postings_exact(spark, corpus_df):
    got = {
        (r["doc"], r["term"]): (r["tf"], r["dl"])
        for r in retrieval.term_postings(corpus_df, "doc_id", "text").collect()
    }
    want = {}
    for doc_id, text in CORPUS:
        toks = text.split()
        for term, n in Counter(toks).items():
            want[(doc_id, term)] = (n, len(toks))
    assert got == want


def test_bm25_matches_pure_python(spark, corpus_df, qterms_df):
    result = retrieval.bm25_topk(corpus_df, qterms_df, "doc_id", "text", k=5)
    got = {}
    for r in result.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_bm25"])
        )
    ref = _bm25_reference()
    assert set(got) == {qid for qid, rows in ref.items() if rows}
    for qid, rows in ref.items():
        if not rows:
            assert qid not in got  # all-unknown query contributes nothing
            continue
        got_rows = sorted(got[qid])
        assert [(rk, d) for rk, d, _ in got_rows] == [(rk, d) for rk, d, _ in rows]
        for (_, _, s_got), (_, _, s_ref) in zip(got_rows, rows):
            assert s_got == pytest.approx(s_ref, abs=1e-4)


def test_bm25_unknown_term_ignored(spark, corpus_df, qterms_df):
    """Query 2 mixes an unknown term with 'scan' — ranking must equal a
    'scan'-only query (unknown terms drop out, no error, no null scores)."""
    result = retrieval.bm25_topk(corpus_df, qterms_df, "doc_id", "text", k=5)
    q2 = sorted(
        (r["rank"], r["doc_id"]) for r in result.collect() if r["query_id"] == 2
    )
    scan_only = spark.createDataFrame([(2, "scan")], "query_id int, term string")
    alone = retrieval.bm25_topk(corpus_df, scan_only, "doc_id", "text", k=5)
    assert q2 == sorted((r["rank"], r["doc_id"]) for r in alone.collect())


def test_inverted_index_head(spark, corpus_df):
    idx = {
        r["term"]: r
        for r in retrieval.inverted_index(
            corpus_df, "doc_id", "text", postings_head=2
        ).collect()
    }
    assert idx["spark"]["df"] == 3
    assert idx["spark"]["total_tf"] == 4  # doc 0 has it twice
    assert idx["spark"]["postings_head"] == "0,3"  # capped at 2 of 3 docs
    assert idx["join"]["postings_head"] == "0,1"
    assert idx["merge"]["df"] == 2


def test_inverted_index_summary_plan_no_global_window(spark, sf_dir):
    """The top-50 summary cut must be TakeOrderedAndProject (partition-
    local top-k + driver merge), never a row_number window over the FULL
    vocabulary — that sorts every term on one task (round-6 verdict,
    What's wrong #2)."""
    from data_pipeline_with_spark_kafka_spark.queries.registry import all_queries

    df = all_queries()["llm_inverted_index"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # r12: the postings-head election IS a row_number window now, but a
    # TERM-partitioned one compiled to a partial WindowGroupLimit (each
    # map task keeps <= postings_head docs per term before the exchange)
    # — the forbidden shape remains a window over the whole vocabulary
    # on one task, i.e. an empty partition spec.
    assert "WindowGroupLimit" in plan, plan
    for line in plan.splitlines():
        # a global window prints an EMPTY partition-spec list: "], [], ["
        if "Window" in line and "], [], [" in line:
            raise AssertionError(f"global window: {line}")
    rows = df.collect()
    # sf0.001's whole vocabulary is ~31 terms — the cap is <= 50
    assert 0 < len(rows) <= 50
    # verify the cut really is (df desc, term asc) ordered
    key = [(-r["df"], r["term"]) for r in rows]
    assert key == sorted(key)


def test_bm25_plan_shape(spark, corpus_df, qterms_df):
    """The postings shuffle is built once (ReusedExchange), top-k is a
    partial WindowGroupLimit, and nothing goes cartesian except the
    structurally-1-row stats relation."""
    result = retrieval.bm25_topk(corpus_df, qterms_df, "doc_id", "text", k=5)
    result.collect()
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
