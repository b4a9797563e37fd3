"""Custom stateful streaming operators (SURVEY.md §2.8 [EXT]).

- ``running_totals``: per-key running aggregate via
  ``applyInPandasWithState`` — the escape hatch for stateful logic Spark's
  built-in aggregations can't express (custom eviction, conditional
  resets, cross-event derived state). State is a single (count, sum) pair
  per key: fixed-size regardless of stream length.
- ``stream_stream_join``: watermarked inner join of two streams with an
  event-time range constraint — both sides buffer only the watermark
  horizon of state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count long, total double"
OUTPUT_SCHEMA = "location string, n_events long, total_new_cases double"


def _update_totals(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (location,) = key
    count, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        count += len(pdf)
        total += float(pdf["new_cases"].sum())
    state.update((count, total))
    yield pd.DataFrame(
        {"location": [location], "n_events": [count], "total_new_cases": [total]}
    )


def running_totals(parsed: DataFrame) -> DataFrame:
    """Per-location lifetime running totals, emitted every trigger.

    Built-in streaming aggs could express THIS reduction; the operator
    exists as the template for ones they can't (the state type and emit
    policy are arbitrary Python over Arrow batches).
    """
    return (
        parsed.groupBy("location")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    watermark: str = "10 minutes",
    max_lag: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: right events join left events with
    ``right_time`` in [left_time, left_time + max_lag]. The time bound
    plus watermarks let Spark evict both buffers — without them a
    stream-stream join holds unbounded state.

    ``how="left_outer"`` adds the delayed-null contract: a left row with no
    match is emitted null-padded only once the watermark passes its
    eviction bound (state can prove no future match can arrive) — the
    streaming analog of "click-through with not-yet-clicked rows".
    """
    lw = left.withWatermark(left_time, watermark)
    # Rename the right key so the join output has unambiguous columns.
    rw = right.withColumnRenamed(key, f"{key}_r").withWatermark(right_time, watermark)
    cond = (
        (lw[key] == rw[f"{key}_r"])
        & (rw[right_time] >= lw[left_time])
        & (rw[right_time] <= lw[left_time] + F.expr(f"INTERVAL {max_lag}"))
    )
    return lw.join(rw, cond, how).drop(f"{key}_r")
