"""Crafted-edge differential sweep — CORRECTNESS_EDGE.json (round-8
verdict task #6).

Round 7's erasure-cascade empty-table bug was caught by a hand-written
edge test; this tool makes that class of check a COMMITTED ARTIFACT over
the whole oracled registry. Four edge corpora, each derived from the
driver's sf0.001 tables so schemas can never drift:

- ``empty``      every table with 0 rows;
- ``single_row`` every table cut to its first row (most joins go empty);
- ``one_group``  first 120 rows with every non-key grouping column
                 (statuses, types, segments, langs, user_id, label)
                 collapsed to ONE value — one group everywhere;
- ``all_null``   first 120 rows with every nullable non-key column set
                 to NULL (measures NULL propagation through every
                 expression on both engines at once).

Per corpus, every oracled query runs on Spark AND DuckDB with the
driver-strict comparator. A query that RAISES on an edge corpus while its
oracle returns rows is recorded as an error (and counted) — robustness
defects, not just value divergences, are the target.

    python tools/edge_sweep.py               # all four corpora
    python tools/edge_sweep.py empty         # one corpus

Writes CORRECTNESS_EDGE.json next to the official artifacts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DRIVER_SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# Never nulled / never collapsed: join keys and unique ids (collapsing a
# PRIMARY key would break more than it probes; user_id IS a grouping
# column, so it collapses).
KEY_COLS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "doc_id", "vec_id",
}
EDGES = ("empty", "single_row", "one_group", "all_null", "unicode")

# Documented (corpus, query) divergences that are INPUT-CONTRACT
# violations, not engine bugs — each with the contract it violates. The
# artifact records them under "expected" so the headline counts only
# UNEXPLAINED failures.
_NULL_VEC = (
    "NULL embedding vectors are invalid input to vector kernels on BOTH "
    "engines (DuckDB list_inner_product/list_distance raise; numpy kernels "
    "raise; Spark expression folds propagate NULL) — a production ingest "
    "gates them out upstream (dq suite), they never occur in real corpora"
)
_EMPTY_TRAIN = (
    "training on an empty / all-NULL-feature corpus is undefined; the "
    "trainer raises a descriptive ValueError (fail-fast beats emitting a "
    "meaningless model) while the oracle's unrolled CTE chain emits "
    "degenerate NULL weights"
)
EXPECTED_DIVERGENCES: dict[tuple[str, str], str] = {
    ("empty", "llm_train_quality_classifier"): _EMPTY_TRAIN,
    ("all_null", "llm_train_quality_classifier"): _EMPTY_TRAIN,
    # Only the OBSERVED null-vector failures are excused — a query that
    # currently survives all_null must keep surviving it.
    **{
        ("all_null", q): _NULL_VEC
        for q in (
            "emb_pca_project", "emb_pca_explained_variance",
            "llm_sim_topk_bruteforce", "llm_knn_join_exact",
            "llm_sim_topk_lsh_md5", "llm_sim_topk_lsh",
            "llm_dedup_embedding_cosine_fast",
            "llm_dedup_embedding_cosine_ivf", "llm_semdedup_prune",
            "llm_emb_random_projection", "llm_hybrid_rrf",
            "llm_retrieval_label_precision", "llm_retrieval_ndcg_mrr",
            "llm_sim_topk_sq8",
            "llm_sim_topk_ivf_sq8", "llm_mmr_diversified_topk",
            "llm_sim_topk_binary",
        )
    },
}


# Deterministic multibyte decorations for the `unicode` corpus: latin
# diacritics (precomposed AND combining-mark NFD), 3-byte CJK, 4-byte
# supplementary-plane emoji, RTL Arabic, Greek — cycled per row so every
# string function / tokenizer / hash path sees every class. Suffixes
# contain spaces, so tokenizing queries gain real multibyte TOKENS.
_UNI_SUFFIXES = [
    " héllo wörld",
    " café touché",
    " 日本語テキスト",
    " 🎉🔥 emoji",
    " مرحبا بالعالم",
    " Ωμέγα τέλος",
    "",
]


def build_corpus(kind: str, out: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = pq.read_table(os.path.join(DRIVER_SF, f"{t}.parquet"))
        if kind == "empty":
            tab = src.slice(0, 0)
        elif kind == "single_row":
            tab = src.slice(0, 1)
        elif kind == "unicode":
            tab = src.slice(0, min(120, src.num_rows))
            cols = {}
            for field in tab.schema:
                col = tab.column(field.name)
                if field.name in KEY_COLS or not pa.types.is_string(field.type):
                    cols[field.name] = col
                else:
                    raw = col.to_pylist()
                    first = next((v for v in raw if v is not None), "")
                    if first.startswith("{") and first.endswith("}"):
                        # JSON-string column (events.props): decorate
                        # INSIDE the document — appending after the
                        # closing brace makes it malformed, which is the
                        # invalid-JSON contract (pinned by the r7 edge
                        # matrix), not the unicode surface this corpus
                        # probes.
                        import json as _json

                        vals = [
                            None
                            if v is None
                            else v[:-1]
                            + (", " if len(v) > 2 else "")
                            + '"uni": '
                            + _json.dumps(_UNI_SUFFIXES[i % len(_UNI_SUFFIXES)])
                            + "}"
                            for i, v in enumerate(raw)
                        ]
                    else:
                        vals = [
                            None
                            if v is None
                            else v + _UNI_SUFFIXES[i % len(_UNI_SUFFIXES)]
                            for i, v in enumerate(raw)
                        ]
                    cols[field.name] = pa.array(vals, type=field.type)
            tab = pa.table(cols)
        else:
            tab = src.slice(0, min(120, src.num_rows))
            cols = {}
            for field in tab.schema:
                col = tab.column(field.name)
                if field.name in KEY_COLS:
                    cols[field.name] = col
                elif kind == "all_null":
                    cols[field.name] = pa.nulls(len(tab), type=field.type)
                else:  # one_group: collapse to the first non-null value
                    first = next((v for v in col.to_pylist() if v is not None), None)
                    cols[field.name] = pa.array([first] * len(tab), type=field.type)
            tab = pa.table(cols)
        pq.write_table(tab, os.path.join(out, f"{t}.parquet"))


def run_corpus(spark, qs, kind: str, root: str) -> dict:
    import duckdb

    from oracle_compare import normalize

    sf_dir = os.path.join(root, kind)
    build_corpus(kind, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    results: dict = {}
    for name, q in qs.items():
        if q.oracle is None:
            continue
        rec: dict = {"hash_match": None, "err": None}
        try:
            sr = normalize(q.builder(spark, sf_dir).toPandas())
            orr = normalize(con.execute(q.oracle).df())
            rec["spark_rows"], rec["oracle_rows"] = len(sr), len(orr)
            rec["hash_match"] = sr == orr
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {str(exc)[:240]}"
        results[name] = rec
        spark.catalog.clearCache()
        if not rec["hash_match"]:
            print(
                f"  {kind} {name}: "
                f"{'ERR ' + rec['err'] if rec['err'] else 'MISMATCH'}",
                flush=True,
            )
    con.close()
    n_match = sum(1 for r in results.values() if r["hash_match"])
    failures = {n: r for n, r in results.items() if not r["hash_match"]}
    expected = {
        n: dict(r, reason=EXPECTED_DIVERGENCES[(kind, n)])
        for n, r in failures.items()
        if (kind, n) in EXPECTED_DIVERGENCES
    }
    unexplained = {n: r for n, r in failures.items() if n not in expected}
    print(f"{kind}: {n_match}/{len(results)} match, "
          f"{len(expected)} expected-divergence, {len(unexplained)} unexplained",
          flush=True)
    return {
        "n_queries": len(results),
        "n_match": n_match,
        "expected_divergences": expected,
        "unexplained_failures": unexplained,
    }


def main() -> None:
    from data_pipeline_with_spark_kafka_spark.queries import all_queries
    from data_pipeline_with_spark_kafka_spark.session import get_spark

    kinds = [a for a in sys.argv[1:] if a in EDGES] or list(EDGES)
    spark = get_spark("edge-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    root = tempfile.mkdtemp(prefix="edge-sweep-")
    t0 = time.time()
    per_edge: dict = {}
    try:
        for kind in kinds:
            per_edge[kind] = run_corpus(spark, qs, kind, root)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    payload = {
        "comparator": "tests/oracle_compare.normalize (driver-strict)",
        "corpora": "empty / single_row / one_group / all_null derivations "
                   "of the driver sf0.001 tables (tools/edge_sweep.py)",
        "elapsed_sec": round(time.time() - t0, 1),
        "edges": per_edge,
        "total_expected_divergences": sum(
            len(e["expected_divergences"]) for e in per_edge.values()
        ),
        "total_unexplained_failures": sum(
            len(e["unexplained_failures"]) for e in per_edge.values()
        ),
    }
    with open(os.path.join(REPO, "CORRECTNESS_EDGE.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"unexplained failures across {len(kinds)} edge corpora: "
        f"{payload['total_unexplained_failures']} "
        f"(+{payload['total_expected_divergences']} documented input-contract "
        f"divergences) -> CORRECTNESS_EDGE.json"
    )


if __name__ == "__main__":
    main()
