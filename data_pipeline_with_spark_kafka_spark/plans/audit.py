"""Pipeline audit metrics via Spark's CollectMetrics (``df.observe``).

The monitoring surface a production pipeline needs and the reference has
none of: per-micro-batch row counts, null-key counts, and event-time
high-water marks, computed INSIDE the running job as accumulator-style
aggregates — no second pass over the data, no extra action, no shuffle
(CollectMetrics is a streaming-safe global aggregate collected alongside
whatever the sink consumes).

Two retrieval paths, matching Spark's own split:
- batch: a ``pyspark.sql.Observation`` handle — ``obs.get`` blocks until
  the first action and returns the metric row;
- streaming: named ``df.observe(name, ...)`` metrics surface per batch in
  ``StreamingQueryProgress.observedMetrics[name]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit_metric_columns(*, key_col: str | None = None, ts_col: str | None = None) -> list[Column]:
    """The standard audit aggregate set: volume, key integrity, event-time
    high-water mark. All map-side-combinable — at 1000 executors each task
    contributes one partial row."""
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    if key_col is not None:
        metrics.append(
            F.sum(F.col(key_col).isNull().cast("long")).alias(f"null_{key_col}")
        )
    if ts_col is not None:
        metrics.append(F.max(F.col(ts_col)).alias(f"max_{ts_col}"))
    return metrics


def with_streaming_audit(
    df: DataFrame,
    name: str = "audit",
    *,
    key_col: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Attach named observed metrics to a (streaming or batch) DataFrame;
    for streams the values arrive per micro-batch in
    ``query.lastProgress["observedMetrics"][name]``."""
    return df.observe(name, *audit_metric_columns(key_col=key_col, ts_col=ts_col))


def with_batch_audit(
    df: DataFrame,
    *,
    key_col: str | None = None,
    ts_col: str | None = None,
):
    """(df, observation) — batch form. ``observation.get`` returns the
    metric dict after the caller's first action on ``df``."""
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, *audit_metric_columns(key_col=key_col, ts_col=ts_col)), obs
