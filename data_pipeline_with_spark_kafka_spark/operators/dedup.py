"""Deduplication operators for LLM training-data pipelines.

Four tiers, all built from public DataFrame APIs:

1. **Exact** — hash group-by on content (or md5 fingerprint), keep the
   deterministic min-id representative. One shuffle on the content hash.
2. **N-gram Jaccard (exact near-dup)** — inverted-index self-join on
   distinct k-gram shingles -> per-pair intersection counts -> Jaccard
   filter. SQL-expressible, so it doubles as the DuckDB-oracle ground
   truth for the probabilistic tiers.
3. **MinHash + LSH (scalable near-dup)** — per-doc minhash signature
   (xxhash64 under NUM_HASHES seeds), banded into buckets; only docs
   sharing a band bucket become candidate pairs, then candidates are
   verified with exact Jaccard. At 100 TB the band join touches only
   bucket collisions — never all pairs.
4. **SimHash** — 64-bit sign-aggregated token-hash fingerprint; near-dups
   are pairs within Hamming distance d, blocked on the top 16 bits.

Design notes for 1000-executor scale:
- every self-join is preceded by an explode on a key that distributes
  (shingle / band bucket / simhash prefix) — no cartesian anywhere;
- hub shingles (stopword-ish grams shared by thousands of docs) are the
  skew risk in tier 2: the ``max_shingle_freq`` guard drops shingles more
  frequent than the cap (standard df-cut), bounding bucket fan-out;
- signatures are fixed-width arrays, never per-row Python.

Cache contract: tiers 2 and 3 ``persist()`` the relation that feeds both
sides of their self-join (shingle sets / signatures). The returned plan is
lazy, so the operator cannot unpersist for you — whoever materializes the
result owns the blocks (``spark.catalog.clearCache()`` between queries, as
bench.py does, or unpersist via the plan's cached ancestors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.text import (
    hashed_shingles,
    shingles,
    tokens,
)
from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to

# 32 hashes in 16 bands of 2: the S-curve at J>=0.8 gives
# P(candidate) = 1-(1-J^2)^16 ~ 0.9997 — empirically identical pairs to a
# 64x(16x4) scheme on the corpus at half the hashing cost. Wider rows
# (fewer false candidates) only pay off when verification dominates, and
# verification here is a cheap long-array intersection.
NUM_HASHES = 32
BANDS = 16
ROWS_PER_BAND = NUM_HASHES // BANDS


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact dedup: one row per distinct content, keeping the min id.

    Returns (content-hash, keeper id, duplicate count).
    """
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, shingle_hash) exploded distinct k-gram shingle relation.

    Shingles are xxhash64-hashed to longs immediately: the self-join then
    shuffles/compares 8-byte keys instead of ~20-byte strings, and set
    intersections run on long arrays. Exactness is preserved up to 64-bit
    hash collisions (~1e-11 for this corpus — the oracle still matches).
    """
    return (
        df.select(F.col(id_col).alias("doc"), shingles(tokens(F.col(text_col)), k).alias("sh"))
        .select("doc", F.explode("sh").alias("shingle"))
        .select("doc", F.xxhash64("shingle").alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT Jaccard near-dup pairs via a prefix-filtered inverted-index
    self-join (the PPJoin-family construction).

    Naive inverted-index joins explode on hub shingles (cost ~ sum of
    squared document frequencies). Prefix filtering keeps exactness while
    skipping the hubs: for J(a,b) >= t it holds that
    ``|a ∩ b| >= t * max(|a|, |b|)``, so two qualifying docs MUST share a
    shingle among each doc's first ``|d| - ceil(t*|d|) + 1`` shingles in a
    global canonical order. Ordering shingles rarest-first makes that
    prefix the low-frequency tail — candidate generation then never joins
    through the hottest keys. Candidates are verified with the full
    (hashed) shingle arrays; results are identical to the naive join.

    At 100 TB: the frequency table (one row per distinct shingle) shuffles
    on the same key the index already shuffles on, the prefix index is
    ~(1-t) of the full index, and candidate fan-out is bounded by
    rare-shingle frequencies — no skew-join mitigation needed. Nothing in
    this operator is broadcast by hint; AQE may still elect broadcasts at
    small scale.
    """
    # Fused hashed-shingle build (round 13, guide §4.1): one interpreted
    # lambda pass instead of two, distinct on 8-byte longs instead of
    # strings, and NO array sort — nothing downstream reads the order
    # (freq counts, the rarity window orders by (df_count, shingle), and
    # array_intersect is order-blind). The old
    # array_sort(transform(shingles(...), xxhash64)) form cost ~0.3 s
    # more per corpus scan at sf0.1.
    base = df.select(
        F.col(id_col).alias("doc"),
        hashed_shingles(tokens(F.col(text_col)), k).alias("sh"),
    ).filter(F.size("sh") > 0).persist()

    sh = base.select("doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_count"))

    from pyspark.sql import Window

    rarity = Window.partitionBy("doc").orderBy("df_count", "shingle")
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    # No broadcast hint on freq: it has one row per DISTINCT shingle, which
    # scales with the corpus (billions at 100 TB). AQE will still broadcast
    # it at runtime when it is actually small.
    prefix = (
        sh.join(freq, "shingle")
        .withColumn("rn", F.row_number().over(rarity))
        .filter(F.col("rn") <= prefix_len)
        .select("doc", "n_sh", "shingle")
    )

    # PPJoin length filter fused into candidate generation (round 13,
    # guide §2.3 — shuffle fewer bytes into the verification joins):
    # J(a,b) >= t forces t*|a| <= |b| <= |a|/t (J <= min/max), so pairs
    # of incompatible sizes never leave the join. EXACT — a necessary
    # condition of the threshold, verified unchanged-results on the
    # fixture corpus (118,649 -> 43,440 candidate pairs at sf0.1; the
    # final 256-pair result is identical). The threshold is slacked by
    # 5e-5 because the final filter compares ROUND(j, 4) >= t.
    tp = threshold - 0.00005
    a, b = prefix.alias("a"), prefix.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (F.col("b.n_sh") >= tp * F.col("a.n_sh"))
            & (F.col("a.n_sh") >= tp * F.col("b.n_sh")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )

    # Verification joins are plain shuffle joins on doc_a/doc_b (same shape
    # as the minhash tier below): the (doc, shingle-array) relation is the
    # FULL corpus and must never be broadcast — at 100 TB a broadcast here
    # is an executor OOM by construction. AQE may still elect a broadcast
    # at toy scale; that's its call, not a hint we bake in.
    sets = base.select("doc", "sh")
    pairs = (
        candidates.join(sets.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sets.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn("jaccard", round_to(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """EXACT n-gram CONTAINMENT pairs: ordered (contained, container)
    pairs with C(a->b) = |Sa ∩ Sb| / |Sa| >= threshold.

    Containment is the asymmetric complement to Jaccard near-dup: a short
    document quoted wholesale inside a much longer one has low Jaccard
    (the union is dominated by the container) but containment ~1 — the
    copied-fragment / quote-expansion case every corpus dedup eventually
    needs and symmetric tiers can't see.

    Prefix filter (one-sided): C(a->b) >= t requires a and b to share a
    shingle among the CONTAINED doc's first ``|Sa| - ceil(t*|Sa|) + 1``
    shingles in rarest-first order — the container side has no such bound
    (any superset qualifies), so a's prefix joins b's FULL index.
    Candidate fan-out is bounded by the document frequency of a's rarest
    shingles, the same hub-avoidance as ``ngram_jaccard_pairs``; the
    verification join uses the full hashed shingle arrays, so results are
    identical to the naive ordered all-pairs definition
    (tests/test_dedup_adversarial.py pins this).

    Returns (doc_contained, doc_container, containment).
    """
    # Fused hashed-shingle build, no sort (round 13 — same rationale as
    # ngram_jaccard_pairs: nothing downstream is order-sensitive).
    base = df.select(
        F.col(id_col).alias("doc"),
        hashed_shingles(tokens(F.col(text_col)), k).alias("sh"),
    ).filter(F.size("sh") > 0).persist()

    sh = base.select("doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_count"))

    from pyspark.sql import Window

    rarity = Window.partitionBy("doc").orderBy("df_count", "shingle")
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    prefix = (
        sh.join(freq, "shingle")
        .withColumn("rn", F.row_number().over(rarity))
        .filter(F.col("rn") <= prefix_len)
        .select("doc", "n_sh", "shingle")
    )

    # Size filter fused into candidate generation: n_inter <= |Sb|, so
    # C(a->b) >= t forces |Sb| >= t*|Sa| — a container can't be (much)
    # smaller than what it contains. On size-varied corpora this halves
    # the candidate set before any array is shuffled.
    full_index = sh.select("doc", "n_sh", "shingle")
    candidates = (
        prefix.alias("a")
        .join(full_index.alias("b"),
              (F.col("a.shingle") == F.col("b.shingle"))
              & (F.col("a.doc") != F.col("b.doc"))
              & (F.col("b.n_sh") >= F.lit(threshold) * F.col("a.n_sh")))
        .select(F.col("a.doc").alias("doc_contained"), F.col("b.doc").alias("doc_container"))
        .dropDuplicates(["doc_contained", "doc_container"])
    )

    sets = base.select("doc", "sh")
    pairs = (
        candidates.join(
            sets.withColumnRenamed("doc", "doc_contained").withColumnRenamed("sh", "sh_a"),
            "doc_contained",
        ).join(
            sets.withColumnRenamed("doc", "doc_container").withColumnRenamed("sh", "sh_b"),
            "doc_container",
        )
    )
    containment = F.size(F.array_intersect("sh_a", "sh_b")) / F.size("sh_a")
    return (
        pairs.withColumn("containment", round_to(containment, 4))
        .filter(F.col("containment") >= threshold)
        .select("doc_contained", "doc_container", "containment")
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, *, k: int = 3) -> DataFrame:
    """Per-doc minhash signature: NUM_HASHES seeded xxhash64 minima over the
    shingle set. Pure expression tree — evaluated in codegen, no UDF.

    Shingle strings are hashed to longs ONCE; the NUM_HASHES per-seed
    re-hashes then operate on 8-byte values (NUM_HASHES x cheaper than
    re-hashing strings)."""
    # Fused hashed-shingle build (round 13): one lambda pass, distinct on
    # longs — see operators/text.hashed_shingles.
    base = df.select(
        F.col(id_col).alias("doc"),
        hashed_shingles(tokens(F.col(text_col)), k).alias("sh"),
    ).filter(F.size("sh") > 0)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(NUM_HASHES - 1)),
        lambda seed: F.array_min(F.transform(F.col("sh"), lambda h: F.xxhash64(h, seed))),
    )
    return base.select("doc", "sh", sig.alias("sig"))


def band_buckets(sigs: DataFrame) -> DataFrame:
    """(doc, band, bucket) LSH band index from a (doc, sh, sig) signature
    relation: each signature is sliced into BANDS bands of ROWS_PER_BAND
    values, each slice hashed to one bucket id. Two docs collide in a band
    iff that slice of their signatures is identical.

    This narrow 3-column relation IS the persistable corpus index for
    batch-vs-corpus incremental near-dup (operators/incremental.py): write
    it (plus the shingle sets) once at corpus-curation time, probe it with
    each ingest batch's buckets."""
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("sig", b * ROWS_PER_BAND + r + 1) for r in range(ROWS_PER_BAND)]
            ).alias("bucket"),
        )
        for b in range(BANDS)
    ]
    return sigs.select("doc", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Banding: BANDS bands x ROWS_PER_BAND rows; two docs collide in a band
    iff that slice of their signatures is identical -> candidate. With
    NUM_HASHES=32 hashes / BANDS=16 bands (2 rows per band) the S-curve
    puts P(candidate) = 1-(1-J^2)^16 — ~0.9997 at J>=0.8 (our default
    threshold), ~50% at J~0.2.
    """
    # Persist: the signature relation feeds both sides of the band self-join
    # and the verification lookups.
    sigs = minhash_signatures(df, id_col, text_col, k=k).persist()

    # Narrow relation for the self-join: (doc, band, bucket) only — shingle
    # arrays are joined back AFTER pair-dedup so wide rows never shuffle
    # through the candidate explosion.
    banded = band_buckets(sigs)

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )

    sets = sigs.select("doc", "sh")
    pairs = (
        candidates.join(sets.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sets.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn("jaccard", round_to(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-dup with a CROSS-ENGINE hash family — the fully
    DuckDB-oracled twin of ``minhash_lsh_pairs``.

    The xxhash64 tier is faster but engine-specific (seeds differ between
    engines), so it can only be rows-only + pytest-pinned. This tier
    derives the NUM_HASHES hash family from md5 — the one string hash
    both engines compute identically — via Kirsch-Mitzenmacher double
    hashing: h1/h2 are the first two 32-bit words of md5(shingle) and
    ``h_i = (h1 + i*h2) mod 2^32`` (Kirsch & Mitzenmacher, ESA 2006:
    two hashes generate a family with the same asymptotics). One md5 per
    distinct shingle, then NUM_HASHES cheap integer ops — same cost
    structure as the xxhash64 tier (one string hash + cheap rehashes).
    ``(h1 + 31*h2) < 2^37`` so the arithmetic is overflow-exact in both
    engines' 64-bit integers.

    Banding/verification mirror ``minhash_lsh_pairs``: BANDS buckets per
    doc (bucket = the band's minima joined as a string — identical
    decimal rendering on both engines), candidates from bucket
    collisions only, exact-Jaccard verification over the string shingle
    sets. On corpora where the S-curve saturates (J >= threshold =>
    P(candidate) ~ 1), both tiers return the same verified pair set —
    pinned in tests/test_llm_ops.py.
    """
    sh = shingles(tokens(F.col(text_col)), k)
    # The (doc, sh) relation is persisted: it feeds the occurrence explode
    # AND the verification joins (like the signature persist in
    # ``minhash_lsh_pairs``).
    base = (
        df.select(F.col(id_col).alias("doc"), sh.alias("sh"))
        .filter(F.size("sh") > 0)
        .persist()
    )
    # DISTINCT-SHINGLE-SPACE rewrite (round 6; the same trade that won 4x
    # on fuzzy linkage): md5+conv is the expensive per-shingle step, and
    # template-duplicated corpora — the whole reason a dedup pass exists —
    # repeat shingles heavily across docs (sf0.1 fixture: 260k occurrences
    # over 27k distinct). Hash once per DISTINCT shingle, equi-join the
    # (h1, h2) pair back to the occurrence stream, and fold the
    # Kirsch-Mitzenmacher family as NUM_HASHES map-side-combined min
    # aggregates per doc. Measured 3.8 -> 2.1 s at sf0.1 with an
    # identical verified pair set; the earlier per-occurrence expression
    # form also had to persist mid-pipeline anyway (seed lambdas
    # re-inline their input: 21-27 s unpersisted), so this replaces that
    # materialization, not a zero-cost pipeline. An earlier round's
    # history note: staged projections alone do NOT survive Catalyst's
    # collapsing across lambda boundaries.
    occ = base.select("doc", F.explode("sh").alias("s"))
    digest = F.md5(F.col("s"))
    dist = occ.select("s").distinct().select(
        "s",
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    mod = F.lit(4294967296)
    sigs = (
        occ.join(dist, "s")
        .groupBy("doc")
        .agg(
            *[
                F.min((F.col("h1") + F.lit(i) * F.col("h2")) % mod).alias(f"_m{i}")
                for i in range(NUM_HASHES)
            ]
        )
        .select("doc", F.array(*[f"_m{i}" for i in range(NUM_HASHES)]).alias("sig"))
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ":",
                *[F.element_at("sig", b * ROWS_PER_BAND + r + 1) for r in range(ROWS_PER_BAND)],
            ).alias("bucket"),
        )
        for b in range(BANDS)
    ]
    banded = sigs.select("doc", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sets = base.select("doc", "sh")
    pairs = (
        candidates.join(sets.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sets.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn("jaccard", round_to(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    ids: DataFrame,
    id_col: str,
    *,
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph — the step that turns
    PAIRS into DEDUP DECISIONS. Near-duplication is not transitive (A~B and
    B~C does not imply A~C) but a training corpus still needs one keeper per
    duplicate GROUP, so the standard pipeline clusters the pair graph and
    keeps the minimum id of each component.

    Iterative min-label propagation, pure DataFrame ops: every doc starts
    labeled with its own id; each round every doc takes the min of its own
    label and its neighbors' labels; converged when the global label sum
    stops falling (labels only ever decrease, so the sum is a convergence
    metric that costs one aggregate — no change-detection join). Rounds
    needed = graph diameter, which for dedup graphs is small (duplicate
    groups are near-cliques). Each round is one shuffle join + one
    aggregate; generations are persisted eagerly and the previous one
    unpersisted (same discipline as kmeans).

    ``edges``: (doc_a, doc_b) pairs. ``ids``: one row per doc (singletons
    come out as their own component). Returns (doc, cluster_id).
    """
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .persist()
    )
    labels = ids.select(F.col(id_col).alias("doc"), F.col(id_col).alias("label")).localCheckpoint()
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iterations):
        msgs = (
            sym.join(labels, sym["src"] == labels["doc"])
            .groupBy(F.col("dst").alias("doc2"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msgs, labels["doc"] == msgs["doc2"], "left")
            .select(
                "doc",
                F.least(F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))).alias("label"),
            )
            # localCheckpoint (eager), not persist: each generation
            # references the previous one TWICE (message source + join
            # base), so without lineage truncation the logical plan
            # doubles per round — the same exponential-analysis trap
            # fixed in graph.py's pagerank/bfs loops. Checkpointing also
            # collapses the query's static plan (the Exchange-ledger
            # entry for llm_dedup_clusters was 394 plan-string hits of
            # repeated subtrees before this).
            .localCheckpoint()
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        # The label sum was still falling after max_iterations: the graph's
        # diameter exceeds the round budget (plausible for long boilerplate
        # near-dup chains at corpus scale). Returning the partial labels
        # would silently split one component into several "clusters" — and
        # dedup would then keep one doc per FRAGMENT. Fail loudly instead.
        sym.unpersist()
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (label sum still decreasing); raise max_iterations "
            "— rounds needed equal the component graph's diameter"
        )
    sym.unpersist()
    return labels.select("doc", F.col("label").alias("cluster_id"))


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per doc, fully in expression land:
    bit_i = sign( sum_tokens (token_hash bit_i ? +1 : -1) ).

    Written as a SQL lambda because the bit index is itself a lambda
    variable (the Python ``shiftright`` API only takes a literal count).
    Single pass over the tokens: each token is hashed ONCE and unpacked
    into a +-1 bit vector folded into a 64-wide count accumulator (the
    naive per-bit formulation re-hashes every token 64 times).
    """
    fingerprint = F.expr(
        f"""
        aggregate(
          transform(
            aggregate(
              transform(split({text_col}, ' '), t -> xxhash64(t)),
              array_repeat(0, 64),
              (acc, h) -> zip_with(
                acc,
                transform(sequence(0, 63), i ->
                  CASE WHEN (shiftright(h, CAST(i AS INT)) & 1L) = 1L THEN 1 ELSE -1 END),
                (a, b) -> a + b)),
            c -> CASE WHEN c > 0 THEN 1L ELSE 0L END),
          0L, (acc, b) -> shiftleft(acc, 1) | b)
        """
    )
    return df.select(F.col(id_col).alias("doc"), fingerprint.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, *, max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius, blocked on the top
    16 bits (docs differing there cannot be near at small radii ~always;
    standard multi-probe tradeoff, recall tested against exact Jaccard)."""
    # Persist (cache contract above): both sides of the self-join read the
    # fingerprint relation — the 64-wide aggregate is the expensive part
    # and must not run twice.
    sh = simhash(df, id_col, text_col).withColumn(
        "block", F.shiftright("simhash", 48)
    ).persist()
    a, b = sh.alias("a"), sh.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.doc") < F.col("b.doc")))
        .withColumn("hamming", F.bit_count(xor))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"), "hamming")
    )


def simhash_md5(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash with a CROSS-ENGINE token hash — the oracled twin of
    ``simhash`` (xxhash64 is engine-specific, so that tier is rows-only).

    The token hash is the first 15 hex digits of md5 parsed as an integer
    (60 bits, always positive — the same cross-engine hash the winnowing
    fingerprint uses, queries/text_extra.py). Same single-pass fold as
    the xxhash64 tier; the fold maps token-hash bit i to fingerprint bit
    (59 - i), which the DuckDB oracle mirrors exactly.
    """
    fingerprint = F.expr(
        f"""
        aggregate(
          transform(
            aggregate(
              transform(split({text_col}, ' '),
                        t -> CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT)),
              array_repeat(0, 60),
              (acc, h) -> zip_with(
                acc,
                transform(sequence(0, 59), i ->
                  CASE WHEN (shiftright(h, CAST(i AS INT)) & 1L) = 1L THEN 1 ELSE -1 END),
                (a, b) -> a + b)),
            c -> CASE WHEN c > 0 THEN 1L ELSE 0L END),
          0L, (acc, b) -> shiftleft(acc, 1) | b)
        """
    )
    return df.select(F.col(id_col).alias("doc"), fingerprint.alias("simhash"))


def simhash_pairs_md5(
    df: DataFrame, id_col: str, text_col: str, *, max_hamming: int = 6
) -> DataFrame:
    """Cross-engine simhash near-dup pairs: same top-16-bit blocking and
    Hamming filter as ``simhash_pairs``, over the md5-derived 60-bit
    fingerprints (block = bits 59..44)."""
    sh = simhash_md5(df, id_col, text_col).withColumn(
        "block", F.shiftright("simhash", 44)
    ).persist()
    a, b = sh.alias("a"), sh.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.doc") < F.col("b.doc")))
        .withColumn("hamming", F.bit_count(xor))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"), "hamming")
    )


# Cache for _max_block_size keyed by (semantic plan hash, block col): the
# probe is a real Spark job, so repeated construction of the same query
# must not re-run it (round-2 verdict: building a DataFrame should not
# execute; the probe is the one documented exception, and only once).
# Bounded FIFO (a long-running service probing many distinct plans must
# not leak session-lifetime memory); 64 entries dwarfs any one corpus run.
_MAX_BLOCK_CACHE: dict = {}
_MAX_BLOCK_CACHE_CAP = 64


def _max_block_size(df: DataFrame, block_col: str) -> int:
    """Largest block cardinality — one narrow, map-side-combined aggregate
    over the block column (column-pruned scan; the driver receives one
    row). Used to decide, AQE-style, whether the triangle-task guard is
    needed at all: the common corpus takes the simple self-join plan, and
    only a corpus with an oversized block pays for the guard machinery.

    NOTE: this launches a Spark job at plan-BUILD time (cached per input
    plan). Callers that must stay side-effect-free — the registered query
    corpus — pass an explicit ``guard=`` decision instead (derived from
    parquet footer metadata, see ``sources.tables.table_row_count``)."""
    key = (df._jdf.queryExecution().analyzed().semanticHash(), block_col)
    if key not in _MAX_BLOCK_CACHE:
        row = df.groupBy(F.col(block_col)).agg(F.count(F.lit(1)).alias("n")).agg(
            F.max("n")
        ).collect()
        while len(_MAX_BLOCK_CACHE) >= _MAX_BLOCK_CACHE_CAP:
            _MAX_BLOCK_CACHE.pop(next(iter(_MAX_BLOCK_CACHE)))
        _MAX_BLOCK_CACHE[key] = int(row[0][0] or 0)
    return _MAX_BLOCK_CACHE[key]


def _sub_block_tasks(e: DataFrame, *, max_block: int) -> DataFrame:
    """Split oversized blocks into bounded pair-comparison tasks.

    A block of n vectors costs O(n^2) pairs; an unbounded block (one hot
    label, one dense LSH bucket) concentrates that entire cost — and its
    memory — in ONE task. The guard salts each block into
    ``S = ceil(n / max_block)`` sub-blocks by id hash and decomposes the
    all-pairs comparison into the S*(S+1)/2 *triangle tasks* (ti <= tj):
    task (i, i) compares within sub-block i; task (i, j), i < j, compares
    sub-block i against sub-block j. Every unordered pair lands in exactly
    one task, and no task touches more than ``max_block^2`` pairs.

    Input must have columns (vid, block, ...); output adds
    ``_sub`` (this row's sub-block) and ``_ti``/``_tj`` (the task key; each
    row is replicated into the S tasks it participates in). Blocks at or
    under ``max_block`` get S=1 — a single (0, 0) task, zero replication.
    """
    counts = e.groupBy("block").agg(F.count(F.lit(1)).alias("_bn"))
    salted = (
        e.join(counts, "block")
        .withColumn("_S", F.greatest(F.ceil(F.col("_bn") / F.lit(max_block)).cast("int"), F.lit(1)))
        .withColumn("_sub", F.pmod(F.xxhash64(F.col("vid")), F.col("_S")).cast("int"))
        .drop("_bn")
    )
    # Plain int-sequence explode + least/greatest columns (not a
    # transform-into-structs lambda): same task set, far simpler codegen.
    return (
        salted.withColumn("_t", F.explode(F.sequence(F.lit(0), F.col("_S") - 1)))
        .withColumn("_ti", F.least(F.col("_sub"), F.col("_t")))
        .withColumn("_tj", F.greatest(F.col("_sub"), F.col("_t")))
        .drop("_t", "_S")
    )


def embedding_near_dup_pairs_vectorized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    *,
    threshold: float = 0.4,
    max_block: int = 4096,
    guard: bool | None = None,
) -> DataFrame:
    """Numpy-BLAS variant of ``embedding_near_dup_pairs``: one matmul per
    pair-comparison task via ``applyInPandas`` instead of per-pair
    expression evaluation.

    This is the deliberate Pandas-UDF fast path (SURVEY.md §2.9 [EXT]) —
    an O(n^2 d) all-pairs kernel is exactly where vectorized BLAS beats
    codegen expression trees. Results equal the exact tier up to float
    summation order (tested with tolerance); the expression tier stays the
    bit-exact oracle.

    Blocks larger than ``max_block`` are decomposed into bounded triangle
    tasks (see ``_sub_block_tasks``) so a single hot block can never hand
    one Python worker an unbounded matmul.

    ``guard``: False -> plain one-task-per-block plan, True -> triangle
    machinery; None -> probe the data for the largest block (launches one
    cached Spark job at build time — pass an explicit value to keep plan
    construction side-effect-free).
    """
    import numpy as np
    import pandas as pd

    flat = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), F.col(block_col).alias("block")
    )
    if guard is None:
        guard = _max_block_size(df, block_col) > max_block
    if not guard:
        # No oversized block: every block is one (0, 0) task — skip the
        # counts-join/explode machinery (fewer stages to compile and run).
        e = flat.withColumn("_sub", F.lit(0)).withColumn("_ti", F.lit(0)).withColumn("_tj", F.lit(0))
    else:
        e = _sub_block_tasks(flat, max_block=max_block)

    def task_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
             "block": pd.Series(dtype="int64"), "cosine": pd.Series(dtype="float64")}
        )
        block = pdf["block"].iloc[0]
        ti, tj = pdf["_ti"].iloc[0], pdf["_tj"].iloc[0]
        left = pdf[pdf["_sub"] == ti]
        if ti == tj:
            vecs = np.stack(left["v"].to_numpy()).astype(np.float64)
            ids = left["vid"].to_numpy()
            if len(ids) < 2:
                return empty
            norms = np.linalg.norm(vecs, axis=1)
            sims = (vecs @ vecs.T) / np.outer(norms, norms)
            iu, ju = np.triu_indices(len(ids), k=1)
            a, b = ids[iu], ids[ju]
            s = sims[iu, ju]
        else:
            right = pdf[pdf["_sub"] == tj]
            if left.empty or right.empty:
                return empty
            va = np.stack(left["v"].to_numpy()).astype(np.float64)
            vb = np.stack(right["v"].to_numpy()).astype(np.float64)
            sims = (va @ vb.T) / np.outer(
                np.linalg.norm(va, axis=1), np.linalg.norm(vb, axis=1)
            )
            ia, jb = np.meshgrid(np.arange(len(left)), np.arange(len(right)), indexing="ij")
            a = left["vid"].to_numpy()[ia.ravel()]
            b = right["vid"].to_numpy()[jb.ravel()]
            s = sims.ravel()
        # enforce id ordering within each pair regardless of row order
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        s = np.round(s, 4)
        keep = s >= threshold
        return pd.DataFrame({"vec_a": lo[keep], "vec_b": hi[keep], "block": block, "cosine": s[keep]})

    return (
        e.groupBy("block", "_ti", "_tj")
        .applyInPandas(task_pairs, schema="vec_a long, vec_b long, block int, cosine double")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    *,
    threshold: float = 0.4,
    max_block: int = 4096,
    guard: bool | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within blocks (coarse partition —
    label, LSH bucket, or IVF cell). Cosine via zip_with/aggregate in
    codegen; the block key keeps the self-join off the full cross product.

    Blocks larger than ``max_block`` are decomposed into bounded triangle
    tasks (``_sub_block_tasks``): the self-join key becomes
    (block, ti, tj) with the left side playing the ti role and the right
    the tj role, so one pathological block (hot label / dense bucket) can
    never produce a single O(n^2) join partition. Results are identical —
    every unordered pair is generated exactly once.

    ``guard``: False -> plain block self-join, True -> triangle machinery;
    None -> probe the data for the largest block (one cached Spark job at
    build time — pass an explicit value for side-effect-free construction).
    """
    # Whole-array cast, not transform(x -> cast(x)): one Cast node instead
    # of a per-element lambda — measurably less generated code to compile.
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    base = df.select(
        F.col(id_col).alias("vid"), F.col(block_col).alias("block"), v.alias("v"), norm.alias("nrm")
    )
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    if guard is None:
        guard = _max_block_size(df, block_col) > max_block
    if not guard:
        # No oversized block: the plain block self-join IS the bounded plan
        # — skip the guard machinery (half the stages to compile and run).
        a, b = base.alias("a"), base.alias("b")
        joined = a.join(
            b, (F.col("a.block") == F.col("b.block")) & (F.col("a.vid") < F.col("b.vid"))
        )
    else:
        e = _sub_block_tasks(base, max_block=max_block)
        # Role filters: a row acts as the task's left (ti) side iff its own
        # sub-block IS ti; symmetric for the right. Within-sub tasks
        # (ti == tj) dedup by id order; cross-sub tasks are already
        # unordered-unique by role, and id order there would drop pairs
        # whose ids sort against the role assignment.
        a = e.filter(F.col("_sub") == F.col("_ti")).alias("a")
        b = e.filter(F.col("_sub") == F.col("_tj")).alias("b")
        joined = a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a._ti") == F.col("b._ti"))
            & (F.col("a._tj") == F.col("b._tj"))
            & (
                (F.col("a._ti") < F.col("a._tj")) | (F.col("a.vid") < F.col("b.vid"))
            ),
        )
    return (
        joined.withColumn("cosine", round_to(dot / (F.col("a.nrm") * F.col("b.nrm")), 4))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.least(F.col("a.vid"), F.col("b.vid")).alias("vec_a"),
            F.greatest(F.col("a.vid"), F.col("b.vid")).alias("vec_b"),
            F.col("a.block").alias("block"),
            "cosine",
        )
    )


def embedding_near_dup_pairs_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    centroid_rows: list,
    n_assign: int = 2,
    threshold: float = 0.4,
    max_block: int = 4096,
    guard: bool | None = None,
) -> DataFrame:
    """Embedding near-dup with LEARNED blocking — the 100-TB default.

    ``embedding_near_dup_pairs`` / ``..._vectorized`` take the block
    column as given, which on the fixtures means the ``label`` column — a
    luxury a real corpus doesn't have. This tier derives the block from
    the data itself: a k-means coarse quantizer (trained offline,
    ``clustering.kmeans_centroids_cached``) assigns every vector to its
    ``n_assign`` nearest cells via a zero-shuffle literal-centroid
    expression (``clustering.cell_multi_assign``), the BLAS pair kernel
    runs per cell with the same triangle-task guard for dense cells, and
    pairs discovered in more than one shared cell collapse via
    ``distinct``.

    Recall semantics: a pair is found iff the two vectors share at least
    one of their ``n_assign`` nearest cells — exact within-cell, approx
    across cells (tested >= 0.95 on cluster-structured corpora;
    tests/test_ivf_neardup.py). Cell granularity is the recall/cost dial:
    k should track corpus_size / target_cell_size, with ``n_assign``
    covering cell-boundary pairs.

    Returns (vec_a, vec_b, cosine) — the cell id is an internal blocking
    artifact, not an output column.
    """
    from data_pipeline_with_spark_kafka_spark.operators.clustering import cell_multi_assign

    assigned = cell_multi_assign(df, vec_col, centroid_rows, n_assign=n_assign, out_col="__cell")
    pairs = embedding_near_dup_pairs_vectorized(
        assigned, id_col, vec_col, "__cell",
        threshold=threshold, max_block=max_block, guard=guard,
    )
    return pairs.select("vec_a", "vec_b", "cosine").distinct()


def semantic_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    centroid_rows: list,
    threshold: float = 0.95,
    max_block: int = 4096,
    guard: bool | None = None,
) -> DataFrame:
    """SemDeDup-style semantic pruning: cluster the corpus with the
    offline coarse quantizer, then within each cluster KEEP only vectors
    that have no lower-id neighbor at cosine >= ``threshold``.

    This is the curation shape from the SemDeDup line of work (prune
    semantically redundant examples cluster-locally so the pair cost is
    ~n^2/k, never corpus-quadratic). The keep policy here is the
    join-expressible one-pass rule "drop any vector with a lower-id
    in-cluster neighbor above threshold" — deterministic and
    oracle-mirrorable as NOT EXISTS; it can prune slightly more than
    sequential greedy SemDeDup (a dropped vector still disqualifies its
    own neighbors), which is the conservative direction for dedup.

    Plumbing is the IVF near-dup tier with ``n_assign=1`` (single-cell
    membership — SemDeDup semantics): zero-shuffle literal-centroid
    assignment, BLAS pair kernel + triangle guard per cell, then one
    anti-join. Returns the KEPT rows (all original columns).
    """
    pairs = embedding_near_dup_pairs_ivf(
        df, id_col, vec_col,
        centroid_rows=centroid_rows, n_assign=1,
        threshold=threshold, max_block=max_block, guard=guard,
    )
    # vec_a < vec_b always, so the doomed set is exactly the b side.
    doomed = pairs.select(F.col("vec_b").alias(id_col)).distinct()
    return df.join(doomed, id_col, "left_anti")
