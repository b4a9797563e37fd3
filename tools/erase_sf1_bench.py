"""Measure the GDPR erase CLI at sf1 (round-8 verdict task #9).

`run.py erase` is e2e-tested at toy scale; this runs the leaf-first
cascade + two-phase swap on an sf1-shaped universe — 150k customers /
1.5M orders / 6M lineitems (TPC-H-profile twins via
``gen_scale_fixtures.gen_tpch``) + the 1M-event sf1 corpus events table —
with a realistic request-list size, and records wall-clock + rows
rewritten for BASELINE.md (the erasure counterpart of the distillation
loop already proven at sf1).

    python tools/erase_sf1_bench.py [n_subjects]   # default 300
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SF1_EVENTS = os.path.join(REPO, "fixtures", "scale", "sf1", "events.parquet")


def main() -> None:
    import numpy as np

    from gen_scale_fixtures import gen_tpch

    n_subjects = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    root = tempfile.mkdtemp(prefix="erase_sf1_")
    try:
        t0 = time.monotonic()
        gen_tpch(1.0, root, np.random.default_rng(8))
        if os.path.exists(SF1_EVENTS):
            shutil.copyfile(SF1_EVENTS, os.path.join(root, "events.parquet"))
        else:
            import pyarrow.parquet as pq

            from gen_scale_fixtures import EVENTS_PER_SF, USERS_PER_SF, gen_events

            pq.write_table(
                gen_events(EVENTS_PER_SF, USERS_PER_SF, np.random.default_rng(8)),
                os.path.join(root, "events.parquet"),
            )
        gen_s = round(time.monotonic() - t0, 1)
        # subjects spread across the key range (deterministic)
        subjects = ",".join(str(k) for k in range(0, 150_000, 150_000 // n_subjects))
        timings: dict = {"gen_sec": gen_s, "n_subjects": n_subjects}
        for label, extra in (("dry_run", ["--dry-run"]), ("apply", []), ("idempotent_rerun", [])):
            t0 = time.monotonic()
            out = subprocess.run(
                [sys.executable, "-m", "data_pipeline_with_spark_kafka_spark.run",
                 "erase", "--data-dir", root, "--subject-ids", subjects, *extra],
                capture_output=True, text=True, check=True, cwd=REPO,
            )
            timings[label] = {
                "wall_sec": round(time.monotonic() - t0, 1),
                "report": [l for l in out.stdout.splitlines() if "erased" in l],
            }
            print(json.dumps({label: timings[label]}), flush=True)
        print(json.dumps({"metric": "erase_sf1", **timings}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
