"""Corpus-curation operators for LLM training-data pipelines: PII
redaction, benchmark-contamination screening, duplicate-span analysis,
and sequence packing.

Scale shapes:

- PII redaction is pure per-row regex in codegen (``regexp_replace`` /
  ``regexp_count``) — zero shuffles, stacks onto any scan.
- Contamination and duplicate-span analysis are one exploded-shingle
  hash-shuffle each (the same bounded shape as the dedup tiers): the
  shingle relation is narrow ``(doc, shingle)``, the per-shingle
  aggregation is map-side-combined, and nothing is broadcast — AQE may
  still choose a broadcast when the benchmark side is genuinely small.
- Sequence packing is the concat-then-chunk packing used for pretraining
  batches: an order-preserving range partition per shard, a per-shard
  running token offset, and ``floor(offset / budget)`` bin ids. The
  recurrence-style "never overflow a bin" packing is inherently
  sequential; sharding bounds each sequential scan to one partition.

No Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Portable regex subset (valid and identical in meaning for Java regex and
# RE2/DuckDB): character classes, bounded repetition, no lookaround.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,6}"
IP_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

# Redaction order matters and is part of the operator contract: emails
# first (they may contain digit runs), then phones, then bare IPs.
PII_RULES: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IP_RE, "<IP>"),
)


def redact_pii(text_col: Column) -> Column:
    """Replace every email/phone/IP occurrence with a typed placeholder."""
    out = text_col
    for pattern, replacement in PII_RULES:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-category PII hit counts (on the raw text, pre-redaction)."""
    return {
        "n_emails": F.regexp_count(text_col, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(text_col, F.lit(PHONE_RE)),
        "n_ips": F.regexp_count(text_col, F.lit(IP_RE)),
    }


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination screen: for every corpus doc, the fraction
    of its distinct k-gram shingles that appear anywhere in the benchmark
    set. Docs with fewer than k tokens have no shingles and come out with
    overlap 0.

    Plan: two narrow shingle explosions, one left join on the shingle
    string (hash-shuffled; the benchmark side is deduplicated first so its
    size is its vocabulary, not its corpus), one per-doc aggregate. At
    100 TB the benchmark side is small by construction (benchmarks are MBs)
    and AQE will broadcast it on its own — no hint needed.
    """
    from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
    from data_pipeline_with_spark_kafka_spark.operators.text import (
        hashed_shingles,
        tokens,
    )

    # Per-doc shingle COUNT is a pure expression (size of the distinct
    # shingle array) — no explode, no shuffle. Only the overlap needs the
    # exploded relation, and that joins LEFT-SEMI against the deduplicated
    # benchmark vocabulary: rows that miss are dropped at the join instead
    # of being carried to the aggregate as nulls.
    # Shingle identity by 64-bit hash on BOTH sides before any shuffle —
    # 8-byte join keys instead of k-word strings (same collision analysis
    # as shared_span_fraction: a collision can only nudge n_overlap up by
    # one, and the string-keyed DuckDB oracle would catch one at
    # validation scale).
    # Fused hash-in-the-shingle-lambda build (round 13, guide §4.1): one
    # interpreted array walk instead of two, dedup on longs — see
    # operators/text.hashed_shingles.
    doc_sh = corpus.select(
        F.col(id_col),
        F.explode(hashed_shingles(tokens(F.col(text_col)), k)).alias("shingle"),
    )
    bench_sh = benchmark.select(
        F.explode(hashed_shingles(tokens(F.col(text_col)), k)).alias("shingle")
    ).distinct()
    overlap = (
        doc_sh.join(bench_sh, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    counted = corpus.select(
        F.col(id_col),
        F.size(hashed_shingles(tokens(F.col(text_col)), k))
        .cast("bigint")
        .alias("n_shingles"),
    )
    frac = F.coalesce(
        round_to(F.col("n_overlap") / F.col("n_shingles"), 4), F.lit(0.0)
    )
    return counted.join(overlap, id_col, "left").select(
        id_col,
        "n_shingles",
        F.coalesce("n_overlap", F.lit(0).cast("bigint")).alias("n_overlap"),
        frac.alias("overlap_frac"),
        (frac >= threshold).alias("contaminated"),
    )


def shared_span_fraction(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """MassiveText-style repetition-across-documents metric: the fraction
    of each doc's distinct k-token spans that also occur in at least one
    OTHER document. High fractions mark boilerplate/templated docs that
    pair-level dedup misses (each pair is below its threshold, but the doc
    is stitched from corpus-common spans).

    Plan: one shingle explosion, one per-shingle doc-count aggregate
    (map-side combined; (doc, shingle) is already distinct so a plain
    count counts documents), one join back, one per-doc aggregate.
    """
    from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
    from data_pipeline_with_spark_kafka_spark.operators.text import (
        hashed_shingles,
        tokens,
    )

    # n_spans per doc is a pure expression (no shuffle); the exploded
    # relation only feeds (a) the per-span doc count and (b) a LEFT-SEMI
    # join against the SHARED spans — a relation that boilerplate makes
    # small relative to the full span set, so the join-back touches the
    # shared tail, not the whole corpus explosion.
    #
    # Span identity is the 64-bit hash of the span text, taken BEFORE the
    # shuffle: the aggregate and semi-join then move 8-byte longs instead
    # of ~k-word strings (≈4x narrower shuffle). A hash collision merges
    # two distinct spans — probability ~n^2/2^65 across the corpus span
    # set, which at worst nudges a count up by one; the metric is a
    # fraction thresholded at 0.5, and the DuckDB oracle (string-keyed)
    # stays hash-free, so any collision at validation scale would surface
    # as a mismatch (none can occur below ~billions of spans).
    # Persist (dedup.py cache contract): the exploded span relation feeds
    # both consumers below; without it the shingle explosion runs twice.
    # Token array bound to an attribute first so the k slice-starts inside
    # shingles() don't each re-run split() (the winnowing lesson).
    sh = (
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
        .select(
            F.col(id_col),
            F.explode(hashed_shingles(F.col("_t"), k)).alias("shingle"),
        )
        .persist()
    )
    shared = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_n_docs"))
        .filter(F.col("_n_docs") > 1)
        .select("shingle")
    )
    n_shared = (
        sh.join(shared, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    counted = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t")).select(
        F.col(id_col),
        F.size(hashed_shingles(F.col("_t"), k)).cast("bigint").alias("n_spans"),
    )
    frac = F.coalesce(round_to(F.col("n_shared") / F.col("n_spans"), 4), F.lit(0.0))
    return counted.join(n_shared, id_col, "left").select(
        id_col,
        "n_spans",
        F.coalesce("n_shared", F.lit(0).cast("bigint")).alias("n_shared"),
        frac.alias("shared_frac"),
        (frac >= threshold).alias("templated"),
    )


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: float = 0.5,
    split_seed: str = "split42",
) -> DataFrame:
    """The composed training-data curation pipeline, one declarative plan:

    1. exact dedup (keep the min-id doc per content hash — one shuffle),
    2. quality floor (codegen expression filter, no shuffle),
    3. PII redaction (codegen regex, no shuffle),
    4. deterministic 80/10/10 train/val/test split (md5 bucket, no RNG).

    Returns (id, lang, split, quality, text) with ``text`` redacted —
    ready to write partitioned by (lang, split) so a trainer reading one
    split/language prunes everything else at the directory level. Two
    shuffles total at any scale: the dedup group-by and the write's own
    partitioning; every per-row step rides the same scan.
    """
    from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
    from data_pipeline_with_spark_kafka_spark.operators.text import quality_score, tokens

    keepers = (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias(id_col))
        .drop("_h")
    )
    deduped = docs.join(keepers, id_col, "left_semi")
    quality = quality_score(F.col(text_col), tokens(F.col(text_col)))
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{split_seed}:"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return (
        deduped.withColumn("quality", round_to(quality, 4))
        .filter(F.col("quality") >= min_quality)
        .select(
            id_col,
            "lang",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
            "quality",
            redact_pii(F.col(text_col)).alias(text_col),
        )
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    token_count_col: Column,
    *,
    seed: str = "pack13",
    num_shards: int = 16,
    budget: int = 512,
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are deterministically
    shuffled (md5 of a seeded key), sharded, laid end-to-end per shard, and
    chunked into ``budget``-token bins. Returns per-doc placement:
    (id, shard, n_tokens, offset_start, bin_id).

    This is the packing GPT-style pretraining actually uses (documents are
    concatenated with separators and the stream is chunked at the context
    length) — a doc may straddle a bin boundary; ``bin_id`` is the bin its
    first token lands in. The strict "never split a doc" variant is a
    sequential recurrence; here each shard's scan is one range-partitioned
    window, so shards pack in parallel and no task sees more than
    1/num_shards of the corpus.
    """
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}-shard:"), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        % num_shards
    )
    base = docs.select(
        F.col(id_col),
        key.alias("_k"),
        shard.alias("shard"),
        token_count_col.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_k", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        offset.alias("offset_start"),
        F.floor(offset / budget).alias("bin_id"),
    )
