"""Lazy-construction contract: building a registered query's DataFrame
must not execute Spark jobs (round-2 verdict item 2 — a plan-build-time
job breaks composability and re-runs on every construction).

The one documented exception class is iterative/training algorithms whose
driver loop is the algorithm (connected components' convergence scalar,
BPE's merge loop, the IVF k-means quantizer): their per-iteration jobs are
small-by-construction and the artifacts are memoized, so they behave like
offline model training, not like query construction. They are allowlisted
explicitly below; everything else must launch ZERO jobs at build time.

Detection is job-group-based: every job submitted from this thread during
construction lands in our job group; the status tracker then lists them.
"""

from __future__ import annotations

import pytest

from data_pipeline_with_spark_kafka_spark.queries import all_queries

QUERIES = all_queries()

# Queries whose BUILD legitimately runs an iterative driver loop
# (documented in the operator docstrings; artifacts memoized per input).
ITERATIVE_BUILDERS = {
    "llm_dedup_clusters",  # connected components: per-generation convergence scalar
    "llm_cluster_aware_split",  # composes the same CC loop
    "llm_curated_corpus",  # composes the CC-based dedup stage
    "llm_bpe_vocab",       # BPE merge loop (adaptive driver/distributed)
    "llm_bpe_encode",      # trains via the same loop (memoized per sf_dir)
    "llm_sim_topk_ivf",    # k-means quantizer training (memoized per sf_dir)
    "llm_dedup_embedding_cosine_ivf",  # same quantizer training path
    "llm_knn_join_ivf",                # same quantizer training path
    # round-6 learned-artifact stats passes, one aggregate scan each,
    # memoized per sf_dir (offline-training class, like the quantizer):
    "llm_dsir_importance_topk",  # 256-bucket n-gram distribution estimate
    "llm_sim_topk_sq8",          # SQ8 per-dim min/max codebook
    "llm_sim_topk_ivf_sq8",      # same codebook (+ fixture quantizer cells)
    "llm_sim_topk_ivf_pq",       # fixture quantizer cells + PQ codebook fixture
    "llm_emb_sq8_error",         # same codebook
    "llm_train_quality_classifier",  # logistic-regression GD loop (memoized)
    "emb_kmeans_train",  # verified Lloyd's loop (round 8; memoized per input)
    # round-7: builds + persists the corpus near-dup index (bands/sets/
    # fingerprints) to parquet ONCE per sf_dir — the offline index-build
    # half of the deployment shape; subsequent constructions only read it
    "llm_dedup_incremental_near_probe",
    # round-10/11 skew routers: the fused skew probe (bounded aggregates
    # over the sampled key/day projection) runs eagerly at construction
    # by design — the measured share picks which twin plan to return.
    "events_session_ids_auto",
    "events_markov_transitions_auto",
    # round-11 bloom join prune, literal tier: ONE bounded aggregate job
    # (output fixed at m_bits/64 words) memoized per sf_dir — the same
    # offline-artifact class as the SQ8/PQ codebooks above. The lazy
    # scalar-subquery tier stays job-free; the query uses the literal
    # tier because a Filter with a subquery expression drops to the
    # interpreted predicate path (measured 8x slower, see
    # operators/runtime_filter.py).
    "join_bloom_pruned_urgent_revenue",
}


def test_construction_launches_no_jobs(spark, sf_dir):
    sc = spark.sparkContext
    # Catalog warmup: first contact with a parquet table runs Spark's own
    # schema-inference job (a scan-setup cost, not operator logic); the
    # session-level table memo makes it once-per-table. A deployment has
    # this in the metastore.
    from data_pipeline_with_spark_kafka_spark.sources.tables import load_tables

    load_tables(spark, sf_dir)
    lazy = sorted(set(QUERIES) - ITERATIVE_BUILDERS)
    offenders = {}
    for name in lazy:
        group = f"construct-{name}"
        sc.setJobGroup(group, "lazy-construction contract check")
        try:
            QUERIES[name].builder(spark, sf_dir)
        finally:
            sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        if jobs:
            offenders[name] = list(jobs)
    assert not offenders, (
        f"query construction executed Spark jobs (lazy-plan contract): {offenders}"
    )


def test_iterative_builders_memoize(spark, sf_dir):
    """Second construction of an iterative-builder query must reuse the
    memoized artifact (zero new jobs) — the training loop runs once per
    input, not once per plan construction."""
    sc = spark.sparkContext
    warm = {"llm_sim_topk_ivf"}
    for name in warm:
        QUERIES[name].builder(spark, sf_dir)  # train/memoize
        group = f"rebuild-{name}"
        sc.setJobGroup(group, "memoized-artifact check")
        try:
            QUERIES[name].builder(spark, sf_dir)
        finally:
            sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert not jobs, f"{name} re-ran training jobs on reconstruction: {list(jobs)}"
