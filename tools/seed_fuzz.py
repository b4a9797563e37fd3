"""Seed-differential oracle fuzz (round-7 task #5; TPC-H twins round 8).

Every correctness artifact through round 6 rides the driver's single
seed-42 dataset: a query and its DuckDB oracle that share a
seed-specific accident (a value collision, a tie that never happens, a
bucket that stays empty) would pass forever. This tool regenerates the
FULL sf0.01-shaped table set under FRESH seeds — the corpus tables
(documents/embeddings/events, ``gen_scale_fixtures.generate``) AND,
since round 8, seeded TPC-H-profile twins (same schemas / key ranges /
categorical vocabularies, fresh value draws,
``gen_scale_fixtures.gen_tpch``) — and runs the driver-strict comparator
(tests/oracle_compare.normalize) over the FULL oracled registry per
seed. Round 7 borrowed the driver's seed-invariant TPC-H tables, which
left the ~80 relational/stats queries single-dataset-verified — exactly
the blind spot that hid the round-7 ``func_json_family`` divergence on
the corpus side.

    python tools/seed_fuzz.py            # seeds 7, 123, 20240815
    python tools/seed_fuzz.py 5 11       # custom seed list

Writes CORRECTNESS_SEEDS.json next to the official artifacts. Fixture
data lives in a temp dir — only the artifact is committed.
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
sys.path.insert(0, os.path.join(REPO, "tools"))

TPCH_TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
GENERATED = ["documents", "embeddings", "events"]
DEFAULT_SEEDS = [7, 123, 20240815]


def run_seed(spark, qs, seed: int, root: str) -> dict:
    import duckdb
    import numpy as np

    from gen_scale_fixtures import gen_tpch, generate
    from oracle_compare import normalize

    sf_dir = os.path.join(root, f"seed{seed}")
    generate(0.01, sf_dir, seed=seed)
    # Round 8: TPC-H-profile twins under the same seed (offset stream so
    # the twin tables don't share draws with the corpus tables).
    gen_tpch(0.01, sf_dir, np.random.default_rng(seed + 1_000_003))

    con = duckdb.connect()
    for t in TPCH_TABLES + GENERATED:
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
            rec["err"] = str(exc)[:300]
        results[name] = rec
        spark.catalog.clearCache()
        if not rec["hash_match"]:
            print(f"  seed {seed} {name}: "
                  f"{'ERR ' + rec['err'] if rec['err'] else 'MISMATCH'}", flush=True)
    con.close()
    n_match = sum(1 for r in results.values() if r["hash_match"])
    print(f"seed {seed}: {n_match}/{len(results)} match", flush=True)
    return {
        "n_queries": len(results),
        "n_match": n_match,
        "failures": {
            n: r for n, r in results.items() if not r["hash_match"]
        },
    }


def main() -> None:
    from data_pipeline_with_spark_kafka_spark.queries import all_queries
    from data_pipeline_with_spark_kafka_spark.session import get_spark

    seeds = [int(a) for a in sys.argv[1:]] or DEFAULT_SEEDS
    spark = get_spark("seed-fuzz")
    qs = all_queries()
    root = tempfile.mkdtemp(prefix="seed-fuzz-")
    t0 = time.time()
    per_seed: dict = {}
    try:
        for seed in seeds:
            per_seed[str(seed)] = run_seed(spark, qs, seed, root)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    payload = {
        "comparator": "tests/oracle_compare.normalize (driver-strict)",
        "corpus": "sf0.01-shaped generated documents/embeddings/events per seed "
                  "+ seeded TPC-H-profile twins (same schemas/key ranges/"
                  "vocabularies, fresh value draws — round 8)",
        "elapsed_sec": round(time.time() - t0, 1),
        "seeds": per_seed,
        "total_mismatches": sum(
            len(s["failures"]) for s in per_seed.values()
        ),
    }
    with open(os.path.join(REPO, "CORRECTNESS_SEEDS.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"total mismatches across {len(seeds)} seeds: "
        f"{payload['total_mismatches']} -> CORRECTNESS_SEEDS.json"
    )


if __name__ == "__main__":
    main()
