"""Adversarial corpora for the n-gram Jaccard dedup tiers (round-5
verdict stretch #9): the exact tier's prefix-filter construction claims
result-identity with the naive all-pairs join — freeze that claim against
the corpus shapes that break prefix filters in practice (all-identical
docs, a hub shingle shared by every doc, empty / sub-shingle-width docs),
plus hypothesis-generated low-vocabulary corpora where shingle
collisions and threshold edges are dense."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_with_spark_kafka_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

K = 3
THRESHOLD = 0.8


def _shingle_set(text: str) -> set:
    toks = text.split(" ")
    if len(toks) < K:
        return set()
    return {" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)}


def _round_half_up(x: float, nd: int = 4) -> float:
    return math.floor(x * 10**nd + 0.5) / 10**nd


def naive_pairs(rows: list[tuple[int, str]]) -> set:
    """All-pairs distinct-shingle Jaccard — the definitional oracle,
    mirroring the operator's contract: docs with no shingle drop out,
    jaccard is rounded half-up to 4 places before the threshold."""
    out = set()
    sets = [(i, _shingle_set(t)) for i, t in rows]
    sets = [(i, s) for i, s in sets if s]
    for x in range(len(sets)):
        for y in range(x + 1, len(sets)):
            (ia, sa), (ib, sb) = sets[x], sets[y]
            a, b = min(ia, ib), max(ia, ib)
            j = _round_half_up(len(sa & sb) / len(sa | sb))
            if j >= THRESHOLD:
                out.add((a, b, j))
    return out


def spark_exact(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = ngram_jaccard_pairs(df, "doc_id", "text", k=K, threshold=THRESHOLD)
    return {(r.doc_a, r.doc_b, r.jaccard) for r in got.collect()}


def spark_minhash(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = minhash_lsh_pairs(df, "doc_id", "text", k=K, threshold=THRESHOLD)
    return {(r.doc_a, r.doc_b, r.jaccard) for r in got.collect()}


def test_all_identical_docs(spark):
    rows = [(i, "alpha beta gamma delta epsilon") for i in range(6)]
    expect = {(a, b, 1.0) for a in range(6) for b in range(a + 1, 6)}
    assert spark_exact(spark, rows) == expect
    # banding cannot miss identical signatures: minhash finds them all too
    assert spark_minhash(spark, rows) == expect


def test_hub_shingle_does_not_create_false_pairs(spark):
    # every doc shares one hub 3-gram but nothing else: all true jaccards
    # are far below 0.8 — the prefix filter must not emit them, and must
    # not crash on the hub's df_count == corpus size.
    rows = [(i, f"hub one two tail{i} tail{i}x tail{i}y tail{i}z") for i in range(8)]
    assert naive_pairs(rows) == set()
    assert spark_exact(spark, rows) == set()


def test_hub_plus_true_dups_found_through_hub_corpus(spark):
    # pathological df distribution (one hub everywhere) with a planted
    # near-identical pair: exactness must survive the rarest-first prefix.
    rows = [(i, f"hub one two tail{i} t{i}a t{i}b t{i}c") for i in range(6)]
    rows.append((100, "hub one two tail0 t0a t0b t0c"))  # exact dup of doc 0
    expect = naive_pairs(rows)
    assert (0, 100, 1.0) in expect
    assert spark_exact(spark, rows) == expect


def test_empty_and_subwidth_docs_drop_out(spark):
    rows = [
        (0, ""),  # splits to [''] -> 1 token -> no shingles
        (1, "one"),
        (2, "one two"),  # 2 tokens < k
        (3, "one two three"),
        (4, "one two three"),
    ]
    assert spark_exact(spark, rows) == {(3, 4, 1.0)}
    assert spark_minhash(spark, rows) == {(3, 4, 1.0)}


def test_repeated_token_docs(spark):
    # one distinct shingle each ("a a a"): identical docs J=1, different
    # docs J=0 — degenerate distinct-sets must not divide by zero.
    rows = [(0, "a a a a a a"), (1, "a a a a"), (2, "b b b b b")]
    assert spark_exact(spark, rows) == {(0, 1, 1.0)}


@st.composite
def corpora(draw):
    vocab = ["a", "b", "c", "d"]
    n_docs = draw(st.integers(2, 7))
    rows = []
    for i in range(n_docs):
        n_tok = draw(st.integers(0, 8))
        rows.append((i, " ".join(draw(st.sampled_from(vocab)) for _ in range(n_tok))))
    return rows


@settings(max_examples=12, deadline=None)
@given(corpora())
def test_exact_tier_equals_naive_on_random_low_vocab_corpora(spark, rows):
    """Low vocabulary => dense shingle collisions and jaccard values
    landing on threshold edges; prefix filter must stay exact."""
    assert spark_exact(spark, rows) == naive_pairs(rows)


@settings(max_examples=8, deadline=None)
@given(corpora())
def test_minhash_output_is_subset_of_exact(spark, rows):
    """The LSH tier verifies candidates with exact jaccard, so its output
    can only MISS pairs (banding), never invent or mis-score them."""
    assert spark_minhash(spark, rows) <= naive_pairs(rows)


# ---------------------------------------------------------------------------
# containment_pairs (round 6): asymmetric near-containment
# ---------------------------------------------------------------------------

C_THRESHOLD = 0.9


def naive_containment(rows: list[tuple[int, str]]) -> set:
    out = set()
    sets = [(i, _shingle_set(t)) for i, t in rows]
    sets = [(i, s) for i, s in sets if s]
    for ia, sa in sets:
        for ib, sb in sets:
            if ia == ib:
                continue
            c = _round_half_up(len(sa & sb) / len(sa))
            if c >= C_THRESHOLD:
                out.add((ia, ib, c))
    return out


def spark_containment(spark, rows):
    from data_pipeline_with_spark_kafka_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_pairs(df, "doc_id", "text", k=K, threshold=C_THRESHOLD)
    return {(r.doc_contained, r.doc_container, r.containment) for r in got.collect()}


def test_containment_finds_quote_inside_long_doc(spark):
    # doc 0 is fully quoted inside doc 1: containment(0->1) = 1.0 while
    # jaccard is far below 0.8 — the case the symmetric tier cannot see.
    quote = "alpha beta gamma delta"
    rows = [
        (0, quote),
        (1, f"intro words here {quote} and a very long tail of extra tokens t1 t2 t3 t4 t5 t6"),
    ]
    assert naive_pairs(rows) == set()          # invisible to jaccard
    got = spark_containment(spark, rows)
    assert (0, 1, 1.0) in got
    assert all(p[0] == 0 for p in got)          # the long doc is NOT contained


def test_containment_equals_naive_with_hub_shingle(spark):
    rows = [(i, f"hub one two tail{i} t{i}a t{i}b") for i in range(6)]
    rows.append((100, "hub one two tail0 t0a t0b extra1 extra2 extra3 extra4 extra5"))
    assert spark_containment(spark, rows) == naive_containment(rows)


@settings(max_examples=10, deadline=None)
@given(corpora())
def test_containment_equals_naive_on_random_corpora(spark, rows):
    assert spark_containment(spark, rows) == naive_containment(rows)


# ---------------------------------------------------------------------------
# semantic_prune (round 6): SemDeDup keep policy
# ---------------------------------------------------------------------------


def test_semantic_prune_keeps_lowest_id_per_redundancy_group(spark):
    from data_pipeline_with_spark_kafka_spark.operators.dedup import semantic_prune

    # two well-separated clusters; within each, ids 0/1 (resp. 10/11) are
    # near-identical (cos ~1) and one distant member survives alongside.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),      # pruned (neighbor 0)
        (2, [0.0, 0.0, 1.0, 0.1]),         # same cell A? no - distinct direction
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.01, 0.999, 0.0, 0.0]),     # pruned (neighbor 10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
    kept = semantic_prune(
        df, "vec_id", "embedding", centroid_rows=cents, threshold=0.95, guard=False
    )
    assert {r.vec_id for r in kept.collect()} == {0, 2, 10}


def test_semantic_prune_cross_cell_pairs_survive(spark):
    from data_pipeline_with_spark_kafka_spark.operators.dedup import semantic_prune

    # near-identical pair split across two cells: single-cell membership
    # (SemDeDup semantics) does NOT prune across cells — both kept.
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(1, [1.0, 0.9]), (2, [1.0, 1.1])]
    kept = semantic_prune(
        df, "vec_id", "embedding", centroid_rows=cents, threshold=0.95, guard=False
    )
    assert {r.vec_id for r in kept.collect()} == {0, 1}
