"""Bucketed range join — the scale path for non-equi interval joins.

``point IN [lo, hi)`` joins have two physical regimes:

- small interval side -> BroadcastNestedLoopJoin (what Catalyst picks;
  fine — the fact table streams through once, map-side);
- BIG interval side -> BNLJ is O(|points| x |intervals|) and there is no
  shuffle key. The standard rewrite (Databricks' range-join "bin" hint,
  implemented here from public DataFrame ops): discretize the domain into
  fixed-width buckets, explode each interval into every bucket it covers,
  equi-join point-bucket = interval-bucket (hash shuffle — SortMergeJoin),
  then re-apply the exact bounds as a residual filter. Cost becomes
  O(|points| + |intervals| x avg_span/bucket_width + |candidate pairs|),
  all hash-partitioned — no nested loop, no broadcast requirement.

Bucket width tunes the explosion-vs-selectivity trade: width ~ median
interval span keeps the per-interval explosion O(1) while a candidate
bucket pairs each point with only the intervals overlapping its bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    *,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Equi-join rewrite of ``points.{point_col} IN [{lo_col}, {hi_col})``.

    Intervals are exploded into the buckets they cover via ``sequence``
    (codegen, no UDF); points compute one bucket id. The precise bound
    check is re-applied after the equi-join, so results are EXACTLY the
    non-equi join's. Interval-end buckets are clamped so a half-open
    interval ending exactly on a bucket boundary doesn't replicate into a
    bucket it cannot match.

    Only ``how='inner'`` is supported: an outer mode would need the
    residual bound predicate folded into the join condition itself —
    applied as a post-join filter it silently drops null-padded rows and
    duplicates in-bounds rows per covered bucket.
    """
    if how != "inner":
        raise ValueError(
            "bucketed_range_join supports only how='inner'; outer modes "
            f"would be silently wrong with a residual filter (got {how!r})"
        )
    pb = points.withColumn("_bucket", F.floor(F.col(point_col) / bucket_width).cast("long"))
    lo_b = F.floor(F.col(lo_col) / bucket_width).cast("long")
    # ceil-exclusive: the last covered bucket is floor(hi/w), EXCEPT when
    # hi sits exactly on a bucket boundary — [lo, hi) cannot reach bucket
    # hi/w then. An exact modulo test (not an epsilon shave, which dropped
    # the top sliver for hi within epsilon above a boundary) keeps every
    # matching bucket covered; the residual filter guarantees exactness.
    hi_over_w = F.col(hi_col) / bucket_width
    hi_b = (
        F.floor(hi_over_w) - F.when(F.col(hi_col) % bucket_width == 0, 1).otherwise(0)
    ).cast("long")
    ib = intervals.withColumn(
        "_bucket", F.explode(F.sequence(lo_b, F.greatest(hi_b, lo_b)))
    )
    joined = pb.join(ib, "_bucket", how).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")
