"""Repetition analysis & corpus-level segment dedup for LLM training data.

Real-world corpora are cleaned with line-level rules: Gopher's repetition
filters (duplicate-line fraction, duplicate-line *character* fraction,
top/duplicated n-gram fractions — Rae et al. 2021, table A1) and C4's
"deduplicate at the line level across the whole corpus" step (Raffel et
al. 2020 §2.2). The fixture corpus has no newlines (flat token streams),
so the unit of repetition here is a fixed-width token SEGMENT — the same
math, a deterministic segmenter.

Scale design: per-doc metrics are explode → two hash aggregations keyed
by (doc_id, gram) then doc_id — both map-side combinable, no joins, no
windows over the whole corpus. The corpus-level dedup shuffles once on
the segment text (exactly like exact-dedup on content hash) and once on
doc_id for reassembly; first-occurrence election is a single min(struct)
aggregate, not a global sort.

No Python UDFs anywhere; everything is codegen-friendly built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.operators.text import shingles, tokens

#: Tokens per pseudo-line. 10 keeps segments sentence-sized on the fixture
#: (avg ~60 tokens/doc) and is mirrored verbatim in the SQL oracles.
SEGMENT_WIDTH = 10


def segments(tokens_col: Column, width: int = SEGMENT_WIDTH) -> Column:
    """Non-overlapping ``width``-token segments, re-joined with spaces.

    ``slice`` clips at the array end, so the tail segment is short rather
    than padded — matching the oracle's inclusive list-slice semantics.
    """
    n = F.size(tokens_col)
    n_segs = F.ceil(n / F.lit(float(width))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i * width + 1, width)),
    )
    # sequence(0, -1) would DESCEND ([0, -1]) rather than come out empty —
    # guard the zero-token case explicitly.
    return F.when(n_segs >= 1, segs).otherwise(F.array().cast("array<string>"))


def exploded_segments(docs: DataFrame, *, width: int = SEGMENT_WIDTH) -> DataFrame:
    """(doc_id, pos, seg) — one row per segment, position 0-based.

    The token array is bound to an attribute BEFORE ``segments`` slices
    it: inlined, every per-segment slice re-evaluates the whole split()
    (no common-subexpression elimination across a transform lambda — the
    winnowing lesson, queries/text_extra.py)."""
    d = docs.select("doc_id", tokens(F.col("text")).alias("_t"))
    return d.select(
        "doc_id", F.posexplode(segments(F.col("_t"), width)).alias("pos", "seg")
    )


def repetition_metrics(docs: DataFrame, *, width: int = SEGMENT_WIDTH) -> DataFrame:
    """Gopher-style per-document repetition metrics.

    Returns one row per doc:
      - ``n_segs``            segment count
      - ``dup_seg_frac``      fraction of segments whose text occurs more
                              than once in the doc (all occurrences count)
      - ``dup_seg_char_frac`` same, weighted by segment characters
      - ``top_bigram_char_frac`` chars covered by the single most repeated
                              bigram (count x gram length / doc chars);
                              the max is over the numeric product, so ties
                              need no gram-identity tie-break
      - ``dup_5gram_frac``    fraction of distinct 5-grams occurring >1 time

    Two explode+agg pipelines (segments, grams) joined on doc_id at the
    end — every aggregate is keyed by doc_id (+gram), so partial
    aggregation handles the fan-out and the only shuffles are hash
    repartitions on those keys.
    """
    # Bind the token array once (attribute, not inline expression — see
    # exploded_segments); all three explode pipelines slice from it.
    d = docs.select(
        "doc_id", F.length("text").alias("doc_chars"), tokens(F.col("text")).alias("_t")
    )
    toks = F.col("_t")

    seg_occ = (
        d.select("doc_id", F.explode(segments(toks, width)).alias("seg"))
        .groupBy("doc_id", "seg")
        .agg(F.count("*").alias("cnt"))
    )
    seg_stats = seg_occ.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_segs"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_segs"),
        F.sum(F.col("cnt") * F.length("seg")).alias("seg_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.length("seg")).otherwise(0)
        ).alias("dup_seg_chars"),
    )

    bigram_occ = (
        d.select("doc_id", F.explode(shingles(toks, 2, distinct=False)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    top_bigram = bigram_occ.groupBy("doc_id").agg(
        F.max(F.col("cnt") * F.length("gram")).alias("top_bigram_chars")
    )

    five_occ = (
        d.select("doc_id", F.explode(shingles(toks, 5, distinct=False)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    five_stats = five_occ.groupBy("doc_id").agg(
        F.count("*").alias("n_5grams"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("dup_5grams"),
    )

    # Left-join every stat onto the doc spine: short docs legitimately have
    # no bigrams (<2 tokens) or 5-grams (<5) and must still emit a row.
    base = d.select("doc_id", "doc_chars")
    return (
        base.join(seg_stats, "doc_id", "left")
        .join(top_bigram, "doc_id", "left")
        .join(five_stats, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_segs").cast("long").alias("n_segs"),
            round_to(F.col("dup_segs") / F.col("n_segs"), 4).alias("dup_seg_frac"),
            round_to(F.col("dup_seg_chars") / F.col("seg_chars"), 4).alias(
                "dup_seg_char_frac"
            ),
            round_to(
                F.coalesce(F.col("top_bigram_chars") / F.col("doc_chars"), F.lit(0.0)), 4
            ).alias("top_bigram_char_frac"),
            round_to(
                F.coalesce(F.col("dup_5grams") / F.col("n_5grams"), F.lit(0.0)), 4
            ).alias("dup_5gram_frac"),
        )
    )


def dedup_corpus_segments(docs: DataFrame, *, width: int = SEGMENT_WIDTH) -> DataFrame:
    """C4-style corpus-level segment dedup: every segment TEXT survives
    exactly once in the whole corpus — at its first occurrence (smallest
    (doc_id, pos)); all other occurrences, intra- or inter-document, are
    removed and the remaining segments re-joined in document order.

    Returns (doc_id, text_clean, n_kept, n_removed); docs whose every
    segment was removed elsewhere come out with ``text_clean = ''``.

    Election is ``min(struct(doc_id, pos))`` grouped by segment text —
    one shuffle on the segment (same key profile as exact dedup; segment
    texts are near-unique so no hub keys), then an inner join back on
    (seg, doc_id, pos) that keeps only winners, then one doc_id shuffle to
    reassemble via sort_array(collect_list(struct(pos, seg))) — ordering
    is restored deterministically, never relying on collect_list order.
    """
    segs = exploded_segments(docs, width=width)
    firsts = segs.groupBy("seg").agg(F.min(F.struct("doc_id", "pos")).alias("first"))
    kept = (
        segs.join(firsts, "seg")
        .filter((F.col("doc_id") == F.col("first.doc_id")) & (F.col("pos") == F.col("first.pos")))
        .select("doc_id", "pos", "seg")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "seg"))), lambda s: s["seg"]
            ),
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    totals = docs.select("doc_id", tokens(F.col("text")).alias("_t")).select(
        "doc_id", F.size(segments(F.col("_t"), width)).cast("long").alias("n_segs")
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_segs") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
        )
    )


def remove_repeated_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 10,
) -> DataFrame:
    """Cross-document repeated-SPAN removal at k-gram granularity — the
    ExactSubstr dedup of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better", §4.1) re-expressed relationally: their
    suffix-array finds character substrings shared across docs; here a
    token k-gram is the match unit, so any shared span of >= k tokens is
    found as a run of shared k-grams and every token covered by one is
    dropped (the same "remove from all but one... we remove from all"
    simplification their §4.1 discusses, applied corpus-symmetrically).

    Plan (all keyed, no windows over the corpus): positions explode →
    per-gram distinct-doc count (map-side combinable) → semi-join of
    positions against the repeated grams (gram identity = 64-bit hash,
    same collision analysis as curation.py) → per-doc covered-position
    array (one collect_list agg, bounded by doc length) → one
    token-filter expression over the doc's token array (exists() over
    covered starts). Docs shorter than k tokens pass through unchanged.

    Returns (id, cleaned_text, n_tokens, n_removed).
    """
    # Token array bound to an attribute (see exploded_segments): inlined,
    # every per-gram slice would re-run the whole split().
    tok_docs = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    toks = F.col("_t")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(-1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    # (doc, pos, gram-hash) positions; sequence(0,-1) descends, so clamp
    # short docs to an empty gram array first. Persist (same cache
    # contract as dedup.py): this relation — the largest intermediate in
    # the pipeline, one row per token — feeds BOTH the repeated-gram
    # aggregate and the covered semi-join below; without the persist the
    # tokenize + gram-hash + explode pass runs twice per job.
    pos = tok_docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(F.size(toks) >= k, grams).otherwise(F.array().cast("array<bigint>"))
        ).alias("pos", "g"),
    ).persist()
    # "appears in more than one distinct doc" == min(doc) != max(doc):
    # two fully map-side-combinable aggregates instead of count_distinct's
    # dedup expansion (same shuffle key, far smaller partial state).
    repeated = (
        pos.groupBy("g")
        .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
        .filter(F.col("_lo") != F.col("_hi"))
        .select("g")
    )
    covered = (
        pos.join(repeated, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("_starts"))
    )
    out = tok_docs.join(covered, id_col, "left").withColumn(
        "_starts", F.coalesce("_starts", F.array().cast("array<int>"))
    )
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_starts"), lambda p: (p <= i) & (i < p + F.lit(k))
        ),
    )
    # Stage the kept array too: it is referenced three times below, and
    # its filter-over-exists cost is O(tokens x starts) per evaluation.
    out = out.select(F.col(id_col), toks.alias("_t"), kept.alias("_kept"))
    return out.select(
        F.col(id_col),
        F.concat_ws(" ", "_kept").alias("cleaned_text"),
        F.size("_t").cast("bigint").alias("n_tokens"),
        (F.size("_t") - F.size("_kept")).cast("bigint").alias("n_removed"),
    )
