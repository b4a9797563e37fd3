"""Streaming Markov journey transitions: the incremental twin of the
batch ``events_markov_transitions`` query (round-8 stretch).

Transition counts are ADDITIVE: each consecutive (prev_type, next_type)
pair in a user's (ts, event_id)-ordered stream contributes one count,
and the pair a user's events form across a micro-batch boundary is
recovered from one carried row of state — so the stream emits exact
per-pair transition ROWS and any downstream additive aggregate (the
foreachBatch ledger in ``run_transition_counts``) maintains the same
matrix the batch query computes from full history.

- state per user = ONE row (last event epoch-ms + type): O(1) whatever
  the user's volume — the same minimal footprint as the attribution
  stream, and the same hot-user story: state ops are per-KEY, so a bot
  user costs one state row, not a straggler sort.
- under in-order delivery the emitted pairs are row-for-row the batch
  lag() window's pairs (pinned in tests/test_markov_stream.py).
- eviction: a user idle past ``idle_horizon`` has their state dropped
  once the watermark passes last_event + horizon. A transition spanning
  a LONGER gap is then not emitted — the documented trade for bounded
  state; the batch query over full history is the reconciliation pass
  (the same lambda split as the attribution stream).

No counterpart in the 319-LoC reference (its only streaming agg is a
windowed sum, ``spark_consumer_kafka.py:113-127``); [EXT] surface.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_pipeline_with_spark_kafka_spark.streaming.attribution_stream import (
    _duration_ms,
)

STATE_SCHEMA = "last_ms long, last_type string"
OUTPUT_SCHEMA = "user_id long, prev_type string, next_type string"


def _make_update(idle_horizon_ms: int):
    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        last_ms, last_type = state.get if state.exists else (None, None)
        out: list[tuple] = []
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for r in pdf.itertuples(index=False):
            if last_type is not None:
                out.append((user_id, last_type, r.event_type))
            last_ms = int(pd.Timestamp(r.ts).value // 1_000_000)
            last_type = r.event_type
        if last_type is not None:
            state.update((last_ms, last_type))
            state.setTimeoutTimestamp(
                max(last_ms + idle_horizon_ms, state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(out, columns=["user_id", "prev_type", "next_type"])

    return update


def transitions_stream(
    events: DataFrame,
    *,
    time_col: str = "ts",
    idle_horizon: str = "30 days",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Update-mode stream of exact per-pair transition rows.

    ``events`` must carry (event_id, ts, user_id, event_type) — the
    fixture/wire schema. Every event type participates (the batch query
    has no type filter), so the shuffle carries the full stream; the
    state operator itself is O(1) per user."""
    keyed = (
        events.withWatermark(time_col, watermark)
        .select("user_id", "event_id", F.col(time_col).alias("ts"), "event_type")
        .groupBy("user_id")
    )
    return keyed.applyInPandasWithState(
        _make_update(_duration_ms(idle_horizon)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_transition_counts(stream: DataFrame, checkpoint: str, counts: dict) -> None:
    """foreachBatch ledger: fold the emitted pair rows into an additive
    (prev_type, next_type) -> count dict — the maintained matrix. The
    fold is idempotent under checkpoint replay because foreachBatch
    re-delivers whole epochs; callers persisting externally should key
    writes by epoch_id (the JDBC-upsert sink pattern in this package)."""
    seen_epochs: set[int] = set()

    def fold(df: DataFrame, epoch: int) -> None:
        if epoch in seen_epochs:
            return
        seen_epochs.add(epoch)
        for r in df.groupBy("prev_type", "next_type").count().collect():
            k = (r.prev_type, r.next_type)
            counts[k] = counts.get(k, 0) + r["count"]

    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
