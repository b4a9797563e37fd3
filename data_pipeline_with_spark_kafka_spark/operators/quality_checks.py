"""Declarative data-quality constraint checking (Deequ-style, rebuilt on
plain DataFrame aggregates — no library).

A check suite compiles to ONE aggregate pass over the table: every
column-level constraint (not-null, uniqueness, range, accepted values)
becomes one aggregate expression in a single ``agg`` — at 100 TB the
whole suite costs one scan + one map-side-combined global aggregate, not
one job per check. Referential-integrity checks need the other table and
compile to a LEFT ANTI join count each; their 1-row results union onto
the same output.

Output relation: (check_name, metric, passed) — ``metric`` is always the
VIOLATION COUNT (0 = clean), so thresholds beyond pass/fail stay
possible downstream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint. kind: not_null | unique | in_range | in_set."""

    kind: str
    column: str
    name: str = ""
    lo: float | None = None
    hi: float | None = None
    values: tuple = field(default_factory=tuple)

    @property
    def check_name(self) -> str:
        return self.name or f"{self.kind}({self.column})"


def _violations(c: Check) -> Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        return F.sum(col.isNull().cast("long"))
    if c.kind == "unique":
        # violations = rows - distinct NON-NULL values (COUNT DISTINCT
        # skips nulls on every engine), so null rows count here too —
        # pair with a not_null check to tell the two failure modes apart
        return F.count(F.lit(1)) - F.count_distinct(col)
    if c.kind == "in_range":
        return F.sum(((col < F.lit(c.lo)) | (col > F.lit(c.hi))).cast("long"))
    if c.kind == "in_set":
        lits = F.array(*[F.lit(v) for v in c.values])
        return F.sum((~F.array_contains(lits, col)).cast("long"))
    raise ValueError(f"unknown check kind: {c.kind!r}")


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all column-level checks in ONE aggregate; returns
    (check_name, metric, passed)."""
    aggs = [F.coalesce(_violations(c), F.lit(0)).cast("long").alias(f"_m{i}") for i, c in enumerate(checks)]
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c.check_name).alias("check_name"), F.col(f"_m{i}").alias("metric")
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.check_name").alias("check_name"),
            F.col("p.metric").alias("metric"),
            (F.col("p.metric") == 0).alias("passed"),
        )
    )


def referential_check(
    df: DataFrame, fk_col: str, ref: DataFrame, pk_col: str, *, name: str | None = None
) -> DataFrame:
    """Orphan-count check: rows of ``df`` whose ``fk_col`` has no match in
    ``ref.pk_col``. LEFT ANTI join + count — one shuffle keyed on the fk
    (AQE broadcasts the ref side when it is dimension-sized)."""
    orphans = df.select(F.col(fk_col)).join(
        ref.select(F.col(pk_col).alias(fk_col)), fk_col, "left_anti"
    )
    check_name = name or f"ref({fk_col})"
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("metric")).select(
        F.lit(check_name).alias("check_name"),
        "metric",
        (F.col("metric") == 0).alias("passed"),
    )
