"""As-of (point-in-time) join — an operator Spark lacks natively.

For every left row, attach the single right row with the same key whose
timestamp is the latest at-or-before the left timestamp (``backward``, the
default) or the earliest at-or-after it (``forward``), optionally bounded
by a tolerance; unmatched left rows keep nulls (left join) or drop
(inner).

Spark-first design (no Pandas fallback): tag both sides, union them, and
run ONE window pass per key ordered by time —
``last(<right payload>, ignorenulls=True)`` over the rows-preceding frame
carries the most recent right payload forward onto each left row. That is
a single shuffle on the join key plus a per-key sort: exactly the
sort-merge-join shape, so it scales the same way SMJ does (AQE handles
partition-count; a pathologically hot key concentrates its sort in one
task — the same caveat SMJ has — and is best handled upstream by
time-bucketing the key, since salting would break the global per-key
ordering the semantics require).

Equivalent DuckDB oracle: ``ASOF LEFT JOIN`` + a post null-out for the
tolerance (DuckDB's ASOF has no tolerance clause), which the registered
query uses — see queries/relational.py::join_asof_latest_view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MATCH = "_asof_match"
_TS = "_asof_ts"
_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    how: str = "left",
) -> DataFrame:
    """Point-in-time join of ``right`` onto ``left`` by ``key``.

    ``right_cols`` are the payload columns copied from the matched right
    row (they must not collide with left column names). Ties on timestamp
    match (<= / >= semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    collisions = set(right_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"right_cols collide with left columns: {sorted(collisions)}")

    payload = F.struct(F.col(right_ts).alias(_TS), *(F.col(c) for c in right_cols))
    tagged_r = right.select(
        F.col(key), F.col(right_ts).alias(_TS), payload.alias(_MATCH), F.lit(0).alias(_SIDE)
    )
    tagged_l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    both = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    # backward: ascending time, right rows (side 0) sort before left rows
    # at equal timestamps so a tie matches (<=). forward: descending time
    # achieves the mirrored (>=) semantics with the same carry-forward.
    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # A null left timestamp matches nothing in either direction. Backward
    # gets this for free (asc puts nulls first, before any right row), but
    # forward sorts nulls LAST, where the carry would hand them the
    # minimum-ts right payload — so gate the carry on a non-null timestamp.
    carried = both.withColumn(
        _MATCH,
        F.when(F.col(_TS).isNotNull(), F.last(_MATCH, ignorenulls=True).over(w)),
    )

    out = carried.filter(F.col(_SIDE) == 1)
    if tolerance_seconds is not None:
        # TIMESTAMP_NTZ has no direct double cast; go via TIMESTAMP (the
        # session is pinned UTC, so the hop is lossless incl. sub-second).
        gap = F.abs(
            F.col(_TS).cast("timestamp").cast("double")
            - F.col(f"{_MATCH}.{_TS}").cast("timestamp").cast("double")
        )
        out = out.withColumn(
            _MATCH, F.when(gap <= F.lit(float(tolerance_seconds)), F.col(_MATCH))
        )
    if how == "inner":
        out = out.filter(F.col(_MATCH).isNotNull())

    matched_ts = F.col(f"{_MATCH}.{_TS}").alias(f"matched_{right_ts}")
    return out.select(
        *left.columns, matched_ts, *(F.col(f"{_MATCH}.{c}").alias(c) for c in right_cols)
    )
