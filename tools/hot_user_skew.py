"""Measure the hot-user bound of the sequence-window family (round-8
verdict task #3).

Every sequence query here (last-touch attribution, Markov transitions,
sessionization ids) partitions its window by ``user_id`` — the standard
shape for sequence analytics in every engine. AQE can split skewed JOIN
partitions but **cannot split a Window partition**, so one pathological
bot user that owns 50–90% of all events becomes ONE sort task at 100 TB.
This tool puts numbers on that straggler: events tables where the hot
user owns {0%, 50%, 90%} of rows, each run through the three lifetime
sequence queries AND their three day-bucketed twins (attribution r8,
Markov r8, sessionization r9 — each exact: same oracle, but the
per-user window is split by calendar day so the worst partition is the
hot user's busiest DAY, not their lifetime).

    python tools/hot_user_skew.py [n_rows ...]              # default 5_000_000
    python tools/hot_user_skew.py --hot 0.9 [n_rows ...]    # one hot level
    python tools/hot_user_skew.py --single-day [n_rows ...] # round 10: the
        one skew shape the DAY twins cannot split — a bot whose 90% of
        the corpus lands in a SINGLE day, so the day twin's worst sort
        partition is that whole day. Runs the three sessionization
        variants (lifetime / day / hour buckets); the hour twin's worst
        partition is the bot's busiest hour (~1/24th of its rows).

Each (dataset, query) pair is run twice and the MIN reported — the first
execution in a session carries codegen/JIT warmup that mis-attributes tens
of seconds to whichever query runs first (observed: 59 s cold vs 4.5 s
warm for the same plan). Results + guidance land in BASELINE.md
("hot-user sequence-window bound").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from data_pipeline_with_spark_kafka_spark.queries import all_queries
from data_pipeline_with_spark_kafka_spark.session import get_spark

EVENT_TYPES = np.array(["view", "click", "purchase", "signup"])
QUERY_NAMES = (
    "events_attribution_last_touch",
    "events_attribution_last_touch_bucketed",
    "events_markov_transitions",
    "events_markov_transitions_bucketed",
    "events_session_ids",
    "events_session_ids_bucketed",
)


def gen_events(
    root: str,
    n: int,
    hot_frac: float,
    n_users: int = 50_000,
    *,
    single_day: bool = False,
) -> str:
    """Events table where user 0 owns ``hot_frac`` of all rows; the rest
    are uniform over ``n_users`` (same schema/span as the driver tables).
    With ``single_day`` the hot user's rows all land inside ONE calendar
    day (the rest keep the 30-day span) — the day-bucket-defeating bot."""
    out = os.path.join(root, f"hot{int(hot_frac * 100):02d}{'sd' if single_day else ''}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(8)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    users = rng.integers(1, n_users, size=n)
    users[rng.random(n) < hot_frac] = 0
    offsets = rng.integers(0, span_us, size=n)
    if single_day:
        day_us = 24 * 3600 * 1_000_000
        hot_mask = users == 0
        # day 15, uniform over its 24 hours
        offsets[hot_mask] = 14 * day_us + rng.integers(
            0, day_us, size=int(hot_mask.sum())
        )
    table = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                base + offsets.astype("timedelta64[us]"),
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array(users, type=pa.int64()),
            "event_type": pa.array(rng.choice(EVENT_TYPES, size=n)),
            "value": pa.array(rng.gamma(2.0, 10.0, size=n)),
            "props": pa.array([None] * n, type=pa.string()),
        }
    )
    pq.write_table(table, os.path.join(out, "events.parquet"))
    return out


def run_one(spark, name: str, sf_dir: str) -> float:
    builder = all_queries()[name].builder
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        # noop sink: full execution without driver-side collection —
        # events_session_ids emits ~1 session per event on this synthetic
        # spread, and collect() would measure 5M-row driver serialization
        # instead of the window computation under test.
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    # flags are order-independent (round-11 advice fix: '--hot 0.9
    # --single-day' used to leave the flag in the positional sizes)
    argv = sys.argv[1:]
    single_day = "--single-day" in argv
    argv = [a for a in argv if a != "--single-day"]
    explicit_hot: tuple[float, ...] | None = None
    if "--hot" in argv:
        i = argv.index("--hot")
        explicit_hot = (float(argv[i + 1]),)
        del argv[i : i + 2]
    query_names = QUERY_NAMES
    if single_day:
        hots = explicit_hot or (0.9,)
        query_names = (
            "events_session_ids",
            "events_session_ids_bucketed",
            "events_session_ids_bucketed_hourly",
            "events_markov_transitions",
            "events_markov_transitions_bucketed",
            "events_markov_transitions_bucketed_hourly",
            "events_attribution_last_touch",
            "events_attribution_last_touch_bucketed",
            "events_attribution_last_touch_bucketed_hourly",
        )
    else:
        hots = explicit_hot or (0.0, 0.5, 0.9)
    sizes = [int(a) for a in argv] or [5_000_000]
    spark = get_spark(app_name="hot-user-skew")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="hotuser_")
    results: list[dict] = []
    try:
        for n in sizes:
            for hot in hots:
                sf_dir = gen_events(root, n, hot, single_day=single_day)
                row: dict = {"rows": n, "hot_frac": hot, "single_day": single_day}
                for q in query_names:
                    row[q] = run_one(spark, q, sf_dir)
                results.append(row)
                print(json.dumps(row), flush=True)
                shutil.rmtree(sf_dir, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "hot_user_skew", "results": results}))


if __name__ == "__main__":
    main()
