"""Interleaved A/B micro-bench for optimization work on a co-tenant host.

Load here swings 2-10x within minutes, so sequential before/after timing
lies. This harness interleaves the variants (A, B, A, B, ...) with the
noop sink and reports min/median per variant — both variants see the
same contention windows, so the RATIO is trustworthy even when the
absolute numbers are inflated.

Usage: import from an experiment script —

    from tools.ab_bench import ab
    ab(spark, {"current": lambda: build_a(), "fanout": lambda: build_b()}, rounds=5)
"""

from __future__ import annotations

import statistics
import time


def ab(spark, variants: dict, rounds: int = 5, clear_cache: bool = True) -> dict:
    times: dict[str, list[float]] = {k: [] for k in variants}
    # warm-up: one unrecorded run of each
    for name, build in variants.items():
        build().write.format("noop").mode("overwrite").save()
        if clear_cache:
            spark.catalog.clearCache()
    for _ in range(rounds):
        for name, build in variants.items():
            df = build()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
            if clear_cache:
                spark.catalog.clearCache()
    out = {}
    for name, ts in times.items():
        out[name] = {"min": round(min(ts), 3), "med": round(statistics.median(ts), 3)}
        print(f"{name:40s} min={out[name]['min']:7.3f}  med={out[name]['med']:7.3f}  all={[round(t,2) for t in ts]}")
    return out
