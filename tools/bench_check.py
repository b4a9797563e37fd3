"""Bench regression guard: run bench.py and fail if the corpus at sf0.1
exceeds 2x the recorded BASELINE.md PER-QUERY cost (42.8 s / 86 queries
= 0.498 s, round 1) — the driver contract's "BENCH within 2x of
BASELINE at the same scale factor", normalized per query because the
corpus has grown ~2.5x since the baseline was recorded (a raw-total
threshold silently went stale around the 200-query mark).

Usage: python tools/bench_check.py  (exit 1 on regression)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

BASELINE_PER_QUERY_SEC = 42.8 / 86  # BASELINE.md round-1 corpus, sf0.1, local[32]
THRESHOLD = 2.0
# Per-query cap (round-12 advice fix): the per-query AVERAGE alone lets a
# single query regress 50x and be averaged away across 200+ queries. No
# individual query may exceed the slowest round-1 query (3.25 s,
# llm_dedup_minhash_lsh per BASELINE.md) by more than the same 2x factor.
SLOWEST_R1_QUERY_SEC = 3.25
PER_QUERY_CAP = SLOWEST_R1_QUERY_SEC * THRESHOLD


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, cwd=repo,
    )
    # bench.py prints the compact headline LAST (driver tail contract);
    # the per-query profile is the earlier long line — take the last
    # parseable line that actually carries "queries".
    result = None
    for l in reversed(out.stdout.splitlines()):
        if not l.startswith("{"):
            continue
        try:
            cand = json.loads(l)
        except json.JSONDecodeError:
            continue
        if "queries" in cand:
            result = cand
            break
    if out.returncode != 0 or result is None:
        print("bench.py failed:\n" + out.stdout[-2000:] + out.stderr[-2000:])
        return 1
    total, sf = result["value"], result["sf"]
    n = len(result["queries"])
    per_query = total / max(1, n)
    limit = BASELINE_PER_QUERY_SEC * THRESHOLD
    slowest = sorted(result["queries"].items(), key=lambda kv: -kv[1])[:10]
    print(
        f"total={total}s sf={sf} n={n} per_query={per_query:.3f}s "
        f"limit={limit:.3f}s/query"
    )
    for name, sec in slowest:
        print(f"  {sec:6.2f}s  {name}")
    if sf == 0.1 and per_query > limit:
        print(
            f"REGRESSION: {per_query:.3f}s/query > {limit:.3f}s/query "
            f"(2x baseline {BASELINE_PER_QUERY_SEC:.3f}s/query)"
        )
        return 1
    over_cap = [
        (name, sec) for name, sec in result["queries"].items() if sec > PER_QUERY_CAP
    ]
    if sf == 0.1 and over_cap:
        for name, sec in sorted(over_cap, key=lambda kv: -kv[1]):
            print(
                f"REGRESSION: {name} at {sec:.2f}s exceeds the per-query cap "
                f"{PER_QUERY_CAP:.2f}s (2x the slowest round-1 query)"
            )
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
