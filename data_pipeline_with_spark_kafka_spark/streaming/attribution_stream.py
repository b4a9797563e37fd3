"""Streaming last-touch attribution: the real-time twin of the batch
``events_attribution_last_touch`` query.

Each purchase is credited, AT ARRIVAL TIME, to the user's most recent
preceding touch (view/click) within the lookback window. The batch query
carries the touch with an ignore-nulls window over the (ts, event_id)
order; here the carry IS the state:

- state per user = ONE row (last touch epoch-ms + type) — O(1) whatever
  the user's event volume, the smallest possible stateful-streaming
  footprint;
- each micro-batch processes the user's rows in (ts, event_id) order
  against the carried touch, so under in-order delivery the emitted
  attribution is row-for-row the batch query's per-purchase verdict
  (pinned in tests/test_attribution_stream.py);
- state evicts once the watermark passes last_touch + lookback: a touch
  older than the lookback can never attribute anything, so state rows
  are bounded by users ACTIVE within the horizon, not by stream length.

Semantics note (documented, not hidden): attribution is
at-attribution-time. A touch arriving LATE — after a purchase it would
have claimed was already emitted — affects only subsequent purchases;
the batch query, which sees the full history at once, is the
reconciliation pass (exactly the lambda-architecture split the
curation/incremental-dedup streams in this package already use).

No counterpart in the 319-LoC reference (its streaming agg is a plain
windowed sum — ``spark_consumer_kafka.py:113-127``); [EXT] surface.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "touch_ms long, touch_type string"
OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, touch_type string, value double"
)

_UNIT_MS = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}


def _duration_ms(spec: str) -> int:
    supported = ", ".join(f"{u}(s)" for u in _UNIT_MS)
    parts = spec.strip().split()
    if len(parts) != 2:
        raise ValueError(
            f"invalid duration {spec!r}: expected '<count> <unit>' with unit "
            f"one of {supported}"
        )
    qty_s, unit = parts
    if not qty_s.isdigit() or int(qty_s) <= 0:
        raise ValueError(f"invalid duration {spec!r}: count must be a positive integer")
    if unit.rstrip("s") not in _UNIT_MS:
        raise ValueError(
            f"invalid duration {spec!r}: unsupported unit {unit!r} "
            f"(supported: {supported})"
        )
    return int(qty_s) * _UNIT_MS[unit.rstrip("s")]


def _make_update(lookback_ms: int, touch_types: tuple[str, ...]):
    touch_set = set(touch_types)

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # The carried touch is older than the lookback for every
            # possible future purchase (watermark passed touch+lookback):
            # drop the state row, emit nothing.
            state.remove()
            return
        touch_ms, touch_type = state.get if state.exists else (None, None)
        out: list[tuple] = []
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for r in pdf.itertuples(index=False):
            ts_ms = int(pd.Timestamp(r.ts).value // 1_000_000)
            if r.event_type in touch_set:
                touch_ms, touch_type = ts_ms, r.event_type
            elif r.event_type == "purchase":
                if touch_ms is not None and touch_ms >= ts_ms - lookback_ms:
                    verdict = touch_type
                else:
                    verdict = "unattributed"
                out.append((user_id, r.event_id, r.ts, verdict, r.value))
        if touch_ms is not None:
            state.update((touch_ms, touch_type))
            # Strictly-past-watermark contract (same as trending.py): a
            # touch the watermark already expired times out on the next
            # advance.
            state.setTimeoutTimestamp(
                max(touch_ms + lookback_ms, state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "ts", "touch_type", "value"]
            )

    return update


def attribute_purchases_stream(
    events: DataFrame,
    *,
    time_col: str = "ts",
    lookback: str = "7 days",
    watermark: str = "10 seconds",
    touch_types: tuple[str, ...] = ("view", "click"),
) -> DataFrame:
    """Update-mode stream of per-purchase attribution verdicts.

    ``events`` must carry (event_id, ts, user_id, event_type, value) —
    the fixture/wire schema. Irrelevant event types are filtered BEFORE
    the state operator so the shuffle carries only touches + purchases."""
    relevant = list(touch_types) + ["purchase"]
    keyed = (
        events.withWatermark(time_col, watermark)
        .filter(F.col("event_type").isin(relevant))
        .select("user_id", "event_id", F.col(time_col).alias("ts"), "event_type", "value")
        .groupBy("user_id")
    )
    return keyed.applyInPandasWithState(
        _make_update(_duration_ms(lookback), tuple(touch_types)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
