"""Slowly-changing-dimension (type 2) merge as one declarative pass.

The reference pipeline overwrite-appends dimension rows into MySQL
(``spark_consumer_kafka.py:138-146``) and therefore keeps no history;
this operator is the batch MERGE a warehouse actually needs: given the
current versioned snapshot and an update batch, emit the next snapshot
where changed rows are closed out (``valid_to`` = effective date),
their replacements and brand-new keys are opened, and no-op updates
(identical attribute values) leave the row untouched.

Scale notes (100 TB design):
- ONE shuffle: the full-outer key join between the open slice of the
  snapshot and the batch. AQE broadcast-elects the batch side when it
  is small — the common ingest shape (small batch vs huge dim).
- The three MERGE verdicts (keep / close / open) are derived in a
  single projection from that join: each joined row conditionally
  yields 1-2 output structs (close + open can co-occur), which are
  exploded map-side. No second pass, no per-branch re-join, no
  driver-side diffing.
- Closed history rows never enter the join at all — they are filtered
  out before it and unioned back verbatim.

Contract: ``updates`` must be key-unique (dedupe to latest-per-key
upstream, e.g. with a QUALIFY row_number() = 1); ``snapshot`` rows with
``is_current`` true must have a non-null ``valid_from``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_C_PRESENT = "__scd_c_present"
_U_PRESENT = "__scd_u_present"


def scd2_apply(
    snapshot: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective: Column,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Merge ``updates`` (columns: key + attrs) into a type-2 versioned
    ``snapshot`` (columns: key + attrs + validity columns), returning
    the next snapshot. Null-safe attribute comparison: NULL -> NULL is
    "unchanged", NULL -> value is a change."""
    out_cols = [key, *attrs, valid_from, valid_to, is_current]
    vf_type = dict(snapshot.dtypes)[valid_from]

    cur = snapshot.filter(F.col(is_current)).withColumn(_C_PRESENT, F.lit(True))
    hist = snapshot.filter(~F.col(is_current)).select(*out_cols)
    upd = updates.select(
        key, *[F.col(a).alias(f"__u_{a}") for a in attrs], F.lit(True).alias(_U_PRESENT)
    )

    joined = cur.join(upd, on=key, how="full_outer")
    c_present = F.coalesce(F.col(_C_PRESENT), F.lit(False))
    u_present = F.coalesce(F.col(_U_PRESENT), F.lit(False))
    changed = c_present & u_present
    attr_differs = F.lit(False)
    for a in attrs:
        attr_differs = attr_differs | ~F.col(a).eqNullSafe(F.col(f"__u_{a}"))
    changed = changed & attr_differs

    def row(cols: Sequence[Column]) -> Column:
        return F.struct(*[c.alias(n) for c, n in zip(cols, out_cols)])

    keep = F.when(
        c_present & (~u_present | ~attr_differs),
        row([F.col(key), *[F.col(a) for a in attrs], F.col(valid_from), F.col(valid_to), F.lit(True)]),
    )
    close = F.when(
        changed,
        row([F.col(key), *[F.col(a) for a in attrs], F.col(valid_from), effective, F.lit(False)]),
    )
    open_ = F.when(
        u_present & (~c_present | attr_differs),
        row(
            [
                F.col(key),
                *[F.col(f"__u_{a}") for a in attrs],
                effective,
                F.lit(None).cast(vf_type),
                F.lit(True),
            ]
        ),
    )

    merged = (
        joined.select(
            F.explode(F.filter(F.array(keep, close, open_), lambda x: x.isNotNull())).alias("r")
        )
        .select(*[F.col(f"r.{c}").alias(c) for c in out_cols])
    )
    return merged.unionByName(hist)


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: Sequence[str],
    *,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a CDC change feed (Debezium shape: I / U / D rows) to a
    plain snapshot, returning the next snapshot.

    - I and U both upsert (a U for an unseen key inserts — feeds are
      at-least-once and replays must converge);
    - D removes the key (a D for an unseen key is a no-op);
    - when ``seq_col`` is given the feed is first compacted to the
      LATEST change per key (row_number window over seq desc), so a
      batch carrying a key's whole history applies like its last event.
      (key, seq) pairs must be unique — Debezium LSNs/offsets are; two
      DIFFERENT changes sharing a key's seq would compact
      nondeterministically, so the contract rejects that shape rather
      than inventing a payload-ordering tiebreak.

    Scale notes: compaction and the apply join both hash on the key —
    one window shuffle over the (small) feed plus one full-outer join
    against the snapshot; verdicts are a projection of that join, no
    per-op branch scans.
    """
    from pyspark.sql import Window

    ch = changes
    if seq_col is not None:
        w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
        ch = (
            ch.withColumn("__cdc_rn", F.row_number().over(w))
            .filter(F.col("__cdc_rn") == 1)
            .drop("__cdc_rn")
        )
    ch = ch.select(
        key, *[F.col(a).alias(f"__c_{a}") for a in attrs], F.col(op_col).alias("__cdc_op")
    )
    j = snapshot.join(ch, on=key, how="full_outer")
    has_change = F.col("__cdc_op").isNotNull()
    return (
        j.filter(~has_change | (F.col("__cdc_op") != F.lit("D")))
        .select(
            F.col(key),
            *[
                F.when(has_change, F.col(f"__c_{a}")).otherwise(F.col(a)).alias(a)
                for a in attrs
            ],
        )
    )


def derive_changes(
    old: DataFrame,
    new: DataFrame,
    key: str,
    attrs: Sequence[str],
    *,
    op_col: str = "op",
) -> DataFrame:
    """Derive the CDC change feed that turns snapshot ``old`` into
    snapshot ``new`` — the inverse of :func:`cdc_apply` (snapshot
    differencing, for upstreams that republish full dumps instead of
    emitting change events).

    One full-outer join on the key classifies every row:

    - key only in ``new``            -> I (payload = new attrs)
    - key only in ``old``            -> D (payload = nulls)
    - key in both, any attr differs  -> U (null-safe comparison —
      NULL->value and value->NULL are real updates)
    - key in both, payload identical -> no row (unchanged keys leave
      the feed, which is what makes dump-diffing cheap downstream)

    Round-trip law (property-tested): ``cdc_apply(old,
    derive_changes(old, new)) == new``. Scale: the join hashes both
    snapshots on the key once; the attr comparison is a projection.
    """
    # Side presence is judged on explicit markers, not attr nullness —
    # an all-NULL payload row is still PRESENT on its side.
    o = old.select(key, F.lit(True).alias("__in_old"), *[F.col(a).alias(f"__o_{a}") for a in attrs])
    n = new.select(key, F.lit(True).alias("__in_new"), *[F.col(a).alias(f"__n_{a}") for a in attrs])
    j = o.join(n, on=key, how="full_outer")
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(f"__o_{a}").eqNullSafe(F.col(f"__n_{a}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(differs, F.lit("U"))
    )
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(
            F.col(key),
            F.col(op_col),
            *[
                F.when(F.col(op_col) != "D", F.col(f"__n_{a}")).alias(a)
                for a in attrs
            ],
        )
    )
