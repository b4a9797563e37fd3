"""Time-series regularization: per-key resampling onto a fixed-step
grid with linear interpolation of the gaps.

The missing piece between event streams and model-ready feature tables:
sensors / metrics emit irregularly, training wants a dense regular grid.

Scale notes (100 TB design):
- Stage 1 collapses the raw events to one row per (key, bucket) with a
  map-side-combinable aggregate — the only corpus-sized shuffle.
- The per-key grid is generated with ``sequence()`` from that already
  aggregated relation (|keys| rows in, |keys × buckets| out) — the
  spine never touches the raw events. The aggregated relation is
  persisted: it is |keys × observed buckets| ≪ raw, and is consumed
  twice (bounds + the grid join).
- Interpolation is two window passes over the dense grid (forward
  last-non-null carry, backward first-non-null carry) partitioned by
  key — no self-join, no driver loop. Keys are independent; skewed
  key histories can be range-split upstream if one key's span explodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def _step_seconds(step: str) -> int:
    """Parse ``"N unit"`` (e.g. "15 minutes", "2 hours") into seconds.

    Bucketing floors epoch seconds onto multiples of this, so ANY step
    lands observations on the same grid the ``sequence()`` spine walks —
    a ``date_trunc(unit)`` bucket would put "2 hours" / "15 minutes"
    observations off-grid and silently drop them in the spine join.
    """
    parts = step.strip().split()
    if len(parts) != 2:
        raise ValueError(f"step must be 'N unit', got {step!r}")
    n, unit = int(parts[0]), parts[1].rstrip("s").lower()
    if unit not in _UNIT_SECONDS or n <= 0:
        raise ValueError(f"unsupported resample step {step!r}")
    return n * _UNIT_SECONDS[unit]


def resample_linear(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    *,
    step: str = "1 hour",
    scale: int = 4,
) -> DataFrame:
    """Resample ``value`` per ``key`` onto a ``step`` grid (bucket =
    epoch floor onto step-second multiples — the same grid the spine
    walks, for any step), averaging observations within a bucket and
    linearly interpolating empty buckets between the key's first and
    last observation. Edge gaps carry the nearest value.

    The per-(key, bucket) aggregate stays persisted after return — an
    intentional cache handoff: it is consumed twice lazily (bounds +
    the grid join) and the caller materializes the result; Spark's
    LRU/ContextCleaner reclaims it once the plan is dropped.

    Returns (key, bucket, was_gap, value_filled)."""
    step_secs = _step_seconds(step)
    bucket_expr = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts)) / step_secs) * step_secs
    )
    hourly = (
        df.groupBy(F.col(key), bucket_expr.alias("bucket"))
        .agg(F.avg(value).alias("v"))
        .persist()
    )
    bounds = hourly.groupBy(key).agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    spine = bounds.select(
        key, F.explode(F.expr(f"sequence(mn, mx, interval {step})")).alias("bucket")
    )
    filled = spine.join(hourly, [key, "bucket"], "left")

    w_back = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward carry as a DESC-ordered RUNNING frame (round 13, guide §5):
    # ``first(... ignorenulls) over (currentRow, unboundedFollowing)``
    # compiles to Spark's UnboundedFollowingWindowFunctionFrame, which
    # re-scans from the current row to the partition END for EVERY row —
    # O(n²) per key. ``last(... ignorenulls)`` over a descending running
    # frame is the identical value computed in one O(n) pass; the price
    # is a second Sort under the same (single) Exchange. Measured at
    # sf0.1 (~1,050 grid rows/key): 1.55 -> 0.9 s; at 100 TB per-key
    # history length is the scale axis, so the quadratic frame is the
    # difference between a sort and a key-length-squared scan.
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    pv = F.last("v", ignorenulls=True).over(w_back)
    ph = F.last(obs_bucket, ignorenulls=True).over(w_back)
    nv = F.last("v", ignorenulls=True).over(w_fwd)
    nh = F.last(obs_bucket, ignorenulls=True).over(w_fwd)

    def secs(c: Column) -> Column:
        return F.unix_timestamp(c).cast("double")

    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * (secs(F.col("bucket")) - secs(ph)) / (secs(nh) - secs(ph)))
    )
    return filled.select(
        key,
        "bucket",
        F.col("v").isNull().alias("was_gap"),
        round_to(interp, scale).alias("value_filled"),
    )
