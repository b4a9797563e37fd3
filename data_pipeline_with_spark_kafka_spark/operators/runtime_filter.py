"""Bloom-filter join pruning: cut a fact table's shuffle before a
selective join, with a filter the optimizer can't derive.

The 100-TB problem this solves: ``fact JOIN dim`` where a predicate on
the dim side keeps only a few percent of dim keys. The join itself
shuffles (or at best broadcast-hashes) EVERY fact row, although most
will not survive the join. Spark's own runtime row filters
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) inject exactly this
prune — but only when the optimizer can see a creatable filter below a
shuffle, and never through the constructs user pipelines put between the
dim predicate and the join (aggregated build sides, unioned dims,
checkpoint/persist boundaries, non-equi residuals). This module is the
explicit, composable form of the same trick, built so the expensive side
stays entirely map-side:

- **build** (``bloom_relation``): k seeded ``xxhash64`` bit positions
  per dim key, exploded to (word, mask) and folded with the ``bit_or``
  aggregate — ONE narrow shuffle over the (column-pruned) dim keys whose
  partial aggregation bounds the reduce input at partitions x m/64 rows;
  output is at most ``m_bits/64`` rows no matter how large the dim is.
- **collapse** (``bloom_as_vector``): the (word, bits) relation folded
  into a SINGLE ROW holding a DENSE ``array<long>`` of ``m_bits/64``
  words — a 2^18-bit filter is a 4096-long array (32 KB), always
  broadcastable. Dense array, NOT a map, deliberately: Spark's
  ``element_at`` on a map is a LINEAR SCAN of ArrayBasedMapData (k
  probes x m/64 comparisons per fact row turned a measured 0.17 s count
  into 2.2 s at sf0.1); array ``element_at`` is an O(1) index. The
  densify runs ONCE at build (a ``transform(sequence(...))`` over the
  sparse map), so the per-row probe never touches map semantics.
- **probe**, two tiers measured at sf0.1 (600 k fact rows, plain count
  0.10 s):

  * ``bloom_prune`` — fully LAZY: the vector rides in as a scalar
    subquery, so constructing the plan launches no jobs and the prune
    composes like any other DataFrame op. Cost: a Filter containing a
    subquery expression is evaluated on Spark's INTERPRETED predicate
    path (measured 1.7 s; even a constant-index ``element_at`` against
    the subquery value pays 1.4 s — the subquery reference, not the
    arithmetic, is the cost). Right when the prune guards something
    scan-dominated or laziness is contractual.
  * ``bloom_prune_literal`` — the FAST path the registered query uses:
    ``bloom_words`` runs the (bounded, memoized) build eagerly, embeds
    the words as a plain array LITERAL, and the k bit tests stay inside
    WholeStageCodegen (measured ~0.2 s over the 0.10 s plain count —
    ~8x cheaper than the subquery form). One build job per (sf_dir,
    key), cached — the same offline-artifact class as the SQ8/PQ
    codebooks, and allowlisted the same way in the lazy-construction
    contract. The literal COLUMN itself is also memoized
    (``bloom_literal_column``): ``F.lit`` on a 4096-long Python list
    marshals element-wise over py4j (2.4 s — more than the prune), the
    ndarray path cuts that ~3x, and the cache makes every construction
    after the first free.

  Neither tier explodes, shuffles, or runs a UDF on the fact side: the
  fact table is touched exactly once, and only surviving rows reach the
  join's Exchange.

This differs from ``incremental.bloom_might_contain`` deliberately: that
probe posexplodes the (small) ingest batch and re-groups it — the right
shape when the probe side is the small side. Join pruning is the
opposite regime (probe side = the 100-TB fact), where any per-row
explode or added shuffle would cost more than the join it prunes.

Correctness contract: the same seeded-hash family runs on both sides,
so the filter has NO false negatives — pruning can only drop rows whose
key is provably absent from the dim. For inner/semi joins the pruned
join is therefore EXACT (false positives survive the prune and are
dropped by the join itself), which is what lets the registered query
(`join_bloom_pruned_urgent_revenue`) be oracled against the PLAIN join
SQL: the value hash matching the un-pruned oracle is a proof that the
prune lost nothing. Outer joins must not prune the preserved side;
``bloom_pruned_join`` refuses them.

NULL fact keys hash to the k positions of the seed constants alone
(``xxhash64`` folds nothing for a NULL operand), the same on every row;
whether those bits happen to be set only decides whether NULL rows are
dropped by the prune or by the inner join — the result is identical.

Reference parity: the reference's single join is a stream-static
enrichment (spark_consumer_kafka.py:46-54) with no runtime filtering;
this operator is part of the [EXT] scale surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

DEFAULT_M_BITS = 1 << 18  # 32 KB of filter; FPR ~1.5% at 30k keys, k=5
DEFAULT_K = 5


def _positions(key: F.Column, m_bits: int, k: int) -> F.Column:
    """array of k bit positions in [0, m_bits) for one key value."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]
    )


def bloom_relation(
    dim: DataFrame, key_col: str, *, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """(word: long, bits: long) Bloom filter over ``dim[key_col]`` —
    at most ``m_bits/64`` rows regardless of dim row count."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    probes = dim.select(F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos"))
    return (
        probes.select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(1L, cast(pos & 63 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .limit(m_bits // 64)  # states the pmod bound in the plan itself
    )


def bloom_as_vector(bloom_rel: DataFrame, *, m_bits: int = DEFAULT_M_BITS) -> DataFrame:
    """One row, one column ``__bloom: array<long>`` of exactly
    ``m_bits/64`` words — the broadcastable, O(1)-probe form of the
    filter. The sparse (word, bits) rows are densified once here via a
    map spine; absent words become 0 (no bits set)."""
    n_words = m_bits // 64
    sparse = bloom_rel.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__m")
    )
    return sparse.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(
                F.element_at(F.col("__m"), w.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("__bloom")
    )


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bloom_vec: DataFrame,
    *,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Keep only fact rows whose key might be in the filter — the LAZY
    tier: map-side, zero shuffles, zero jobs at construction. A NULL
    key makes every xxhash64 fold to the seed constant — whether those
    bits are set only decides if NULL rows die here or in the inner
    join; the result is identical either way."""
    # The vector rides in as a SCALAR SUBQUERY (not a crossJoin): a
    # 1-row broadcast cross would make the bit tests the
    # BroadcastNestedLoopJoin's CONDITION — the interpreted Predicate
    # path AND a join node in every consumer's plan. The subquery form
    # keeps the plan a plain Filter, but note: a filter containing a
    # subquery expression still evaluates interpreted (measured ~1.7 s
    # vs the 0.10 s plain count at sf0.1, unchanged between both
    # shapes). That cost is intrinsic to laziness here; callers on a
    # hot path use bloom_prune_literal, whose plain-literal filter
    # compiles into WholeStageCodegen (~0.3 s on the same corpus).
    pruned = fact.withColumn("__bloom", bloom_vec.select("__bloom").scalar())
    # element_at(array, i) is 1-based; the repeated xxhash64 per seed
    # (word index + bit index) is collapsed by whole-stage codegen's
    # subexpression elimination.
    keep = None
    for i in range(k):
        pos = f"pmod(xxhash64(`{key_col}`, {i}), {m_bits})"
        bit = F.expr(
            f"(shiftright(element_at(__bloom, cast(shiftright({pos}, 6) AS INT) + 1), "
            f"cast({pos} & 63 AS INT)) & 1L) = 1L"
        )
        keep = bit if keep is None else keep & bit
    return pruned.where(keep).drop("__bloom")


_WORDS_CACHE: dict[tuple, object] = {}  # words lists and built literal Columns
# Cache-key contract (round-12 advice fix): entries are NEVER invalidated,
# so a key must pin the dim's CONTENT, not just its path — a stale filter
# has false negatives, which silently drop joinable rows. Callers whose
# source files can change within a process lifetime fold
# ``parquet_fingerprint(path)`` into the key; keys without a fingerprint
# assert the source is immutable for the process (true of /root/testdata
# fixtures, not of a live warehouse).


def parquet_fingerprint(path: str) -> tuple:
    """Cheap content fingerprint of a parquet file/dir for cache keys:
    (file count, total bytes, max mtime_ns). Driver-side stat calls —
    the same metadata IO Spark's own file index performs at planning.

    Directories are walked RECURSIVELY (round-13 advice fix): a
    partitioned dim has no top-level ``*.parquet``, and the old flat
    glob fingerprinted every state of such a dim as (0, 0, 0) — silently
    defeating the content pinning this exists for (a stale Bloom filter
    has false NEGATIVES, which drop joinable rows). A path that yields
    no parquet files at all fails loudly instead of fingerprinting
    empty."""
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(root, f)
            for root, _dirs, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    else:
        paths = [path]
    stats = [os.stat(p) for p in paths if os.path.exists(p)]
    if not stats:
        raise FileNotFoundError(
            f"parquet_fingerprint: no parquet files under {path!r} "
            "(mis-pointed path would otherwise fingerprint as empty)"
        )
    return (
        len(stats),
        sum(s.st_size for s in stats),
        max(s.st_mtime_ns for s in stats),
    )


def bloom_words(
    dim: DataFrame,
    key_col: str,
    *,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    cache_key: tuple | None = None,
) -> list[int]:
    """Materialize the dense word vector on the driver: ``m_bits/64``
    signed int64s (<= 32 KB at the 2^18 default — bounded by m_bits,
    never by dim size). One aggregate job; memoized under ``cache_key``
    so repeated query constructions reuse the built filter, like the
    quantizer codebooks."""
    if cache_key is not None and cache_key in _WORDS_CACHE:
        return _WORDS_CACHE[cache_key]
    rows = bloom_relation(dim, key_col, m_bits=m_bits, k=k).collect()
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["word"]] = r["bits"]
    if cache_key is not None:
        _WORDS_CACHE[cache_key] = words
    return words


def bloom_literal_column(words: list[int]):
    """``words`` as an ArrayType(Long) literal Column. Goes through a
    numpy int64 array: ``F.lit`` on a plain Python list marshals
    element-by-element over py4j (measured 2.4 s for 4096 longs — more
    than the prune itself); the ndarray path is ~3x faster cold and the
    callers memoize the built Column so repeated constructions pay
    nothing."""
    import numpy as np

    return F.lit(np.array(words, dtype=np.int64))


def bloom_prune_literal(
    fact: DataFrame,
    key_col: str,
    words,
    *,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """The codegen fast path: ``words`` (a list, or a Column already
    built by ``bloom_literal_column``) embedded as an array literal, so
    the k bit tests compile into the scan's WholeStageCodegen stage."""
    from pyspark.sql import Column

    if isinstance(words, Column):
        arr = words
    else:
        if len(words) != m_bits // 64:
            raise ValueError(f"words must have m_bits/64 = {m_bits // 64} entries")
        arr = bloom_literal_column(words)
    pruned = fact.withColumn("__bloom", arr)
    keep = None
    for i in range(k):
        pos = f"pmod(xxhash64(`{key_col}`, {i}), {m_bits})"
        bit = F.expr(
            f"(shiftright(element_at(__bloom, cast(shiftright({pos}, 6) AS INT) + 1), "
            f"cast({pos} & 63 AS INT)) & 1L) = 1L"
        )
        keep = bit if keep is None else keep & bit
    return pruned.where(keep).drop("__bloom")


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    how: str = "inner",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    literal_cache_key: tuple | None = None,
) -> DataFrame:
    """``fact JOIN dim`` with the fact side bloom-pruned first. Exact for
    inner/semi joins (no false negatives; false positives die in the
    join). Refuses outer joins — pruning a preserved side changes them.

    With ``literal_cache_key`` set, the filter is built EAGERLY (one
    bounded job, memoized under that key) and embedded as a literal —
    the codegen fast path. Without it, the build stays lazy via the
    scalar-subquery tier (see the module docstring for the trade)."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"bloom prune is only exact for inner/semi joins, not {how!r}")
    if literal_cache_key is not None:
        col_key = (*literal_cache_key, "__lit_column")
        arr = _WORDS_CACHE.get(col_key)
        if arr is None:
            words = bloom_words(
                dim, dim_key, m_bits=m_bits, k=k, cache_key=literal_cache_key
            )
            arr = bloom_literal_column(words)
            _WORDS_CACHE[col_key] = arr
        pruned = bloom_prune_literal(fact, fact_key, arr, m_bits=m_bits, k=k)
    else:
        vec = bloom_as_vector(bloom_relation(dim, dim_key, m_bits=m_bits, k=k), m_bits=m_bits)
        pruned = bloom_prune(fact, fact_key, vec, m_bits=m_bits, k=k)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
