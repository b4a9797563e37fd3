"""Corpus-curation queries: PII redaction, benchmark-contamination
screening, duplicate-span (boilerplate) analysis, sequence packing,
quality-weighted sampling, and per-source vocabulary statistics.

Every query here is DuckDB-oracled — the curation decisions that shape a
training corpus are exactly the ones that must be reproducible across
engines and re-runs, so all randomness is md5-keyed (portable) and all
floating-point boundaries are rounded via the repo's cross-engine
``round_to`` invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.operators import curation
from data_pipeline_with_spark_kafka_spark.operators.text import STOPWORDS, quality_score, tokens
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table, load_table_fanned

# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# The synthetic corpus contains no PII, so the query plants deterministic
# PII (derived from doc_id) before redacting — the regexes are genuinely
# exercised and the oracle plants/redacts identically.
PII_ORACLE = f"""
WITH aug AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com ph +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' ip 10.' || CAST(doc_id % 200 AS VARCHAR)
                || '.0.' || CAST(doc_id % 250 AS VARCHAR) AS t
    FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{curation.EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{curation.PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(t, '{curation.IP_RE}')) AS n_ips,
       regexp_replace(
           regexp_replace(
               regexp_replace(t, '{curation.EMAIL_RE}', '<EMAIL>', 'g'),
               '{curation.PHONE_RE}', '<PHONE>', 'g'),
           '{curation.IP_RE}', '<IP>', 'g') AS redacted
FROM aug
"""


@register("llm_pii_redaction", oracle=PII_ORACLE, tags=("llm", "curation"))
def llm_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone/IP detection + placeholder redaction, pure codegen regex
    (zero shuffles). Patterns are a portable Java-regex/RE2 subset so the
    DuckDB oracle runs the byte-identical patterns."""
    docs = load_table_fanned(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ph +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
    )
    with_pii = docs.select("doc_id", aug.alias("t"))
    counts = curation.pii_counts(F.col("t"))
    return with_pii.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ips"].alias("n_ips"),
        curation.redact_pii(F.col("t")).alias("redacted"),
    )


# --------------------------------------------------------------------------
# Benchmark contamination
# --------------------------------------------------------------------------

CONTAMINATION_ORACLE = """
WITH toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' ' || t[CAST(i AS INT) + 2] AS shingle
    FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
    WHERE source <> 'src0'
), bench AS (
    SELECT DISTINCT
           t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' ' || t[CAST(i AS INT) + 2] AS shingle
    FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
    WHERE source = 'src0'
), ag AS (
    SELECT doc_id, COUNT(*) AS n_sh, COUNT(b.shingle) AS n_ov
    FROM sh LEFT JOIN bench b USING (shingle)
    GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(ag.n_sh, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(ag.n_ov, 0) AS BIGINT) AS n_overlap,
       COALESCE(ROUND(ag.n_ov * 1.0 / ag.n_sh, 4), 0.0) AS overlap_frac,
       (COALESCE(ROUND(ag.n_ov * 1.0 / ag.n_sh, 4), 0.0) >= 0.5) AS contaminated
FROM documents d
LEFT JOIN ag ON ag.doc_id = d.doc_id
WHERE d.source <> 'src0'
"""


@register("llm_contamination_overlap", oracle=CONTAMINATION_ORACLE, tags=("llm", "curation"))
def llm_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-test screen: per corpus doc, the fraction of its distinct
    3-gram shingles that occur anywhere in the benchmark set (stand-in:
    source 'src0'). One shingle-join shuffle; the deduplicated benchmark
    side is vocabulary-sized, so AQE broadcasts it when genuinely small."""
    docs = load_table_fanned(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    benchmark = docs.filter(F.col("source") == "src0")
    return curation.contamination_overlap(
        corpus, benchmark, "doc_id", "text", k=3, threshold=0.5
    )


# --------------------------------------------------------------------------
# Duplicate-span (boilerplate) fraction
# --------------------------------------------------------------------------

SHARED_SPAN_ORACLE = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' ' || t[CAST(i AS INT) + 2]
               || ' ' || t[CAST(i AS INT) + 3] || ' ' || t[CAST(i AS INT) + 4] AS shingle
    FROM toks, UNNEST(range(1, len(t) - 3)) AS r(i)
), nd AS (
    SELECT shingle, COUNT(*) AS n_docs FROM sh GROUP BY shingle
), ag AS (
    SELECT doc_id,
           COUNT(*) AS n_spans,
           SUM(CASE WHEN nd.n_docs > 1 THEN 1 ELSE 0 END) AS n_shared
    FROM sh JOIN nd USING (shingle)
    GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(ag.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(ag.n_shared, 0) AS BIGINT) AS n_shared,
       COALESCE(ROUND(ag.n_shared * 1.0 / ag.n_spans, 4), 0.0) AS shared_frac,
       (COALESCE(ROUND(ag.n_shared * 1.0 / ag.n_spans, 4), 0.0) >= 0.5) AS templated
FROM documents d
LEFT JOIN ag ON ag.doc_id = d.doc_id
"""


@register("llm_shared_span_fraction", oracle=SHARED_SPAN_ORACLE, tags=("llm", "curation"))
def llm_shared_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector pair-dedup misses: fraction of each doc's
    distinct 5-token spans that occur in at least one other doc. One
    explode + per-span doc count + join back — all hash-shuffled, nothing
    broadcast."""
    docs = load_table_fanned(spark, sf_dir, "documents")
    return curation.shared_span_fraction(docs, "doc_id", "text", k=5, threshold=0.5)


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------

PACKING_ORACLE = """
WITH t AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           md5('pack13:' || CAST(doc_id AS VARCHAR)) AS k,
           CAST(('0x' || SUBSTRING(md5('pack13-shard:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 16 AS shard
    FROM documents
), placed AS (
    SELECT doc_id, shard, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_start
    FROM t
)
SELECT doc_id, shard, n_tokens, offset_start,
       CAST(FLOOR(offset_start / 512.0) AS BIGINT) AS bin_id
FROM placed
"""


@register("llm_sequence_packing", oracle=PACKING_ORACLE, tags=("llm", "curation"))
def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing of the (deterministically shuffled) corpus
    into 512-token bins across 16 shards — the placement map a pretraining
    loader needs. Per-shard running offsets parallelize across shards; no
    single-partition sort."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.pack_sequences(
        docs,
        "doc_id",
        F.size(tokens(F.col("text"))),
        seed="pack13",
        num_shards=16,
        budget=512,
    )


# --------------------------------------------------------------------------
# Quality-weighted sampling
# --------------------------------------------------------------------------

_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

QUALITY_SAMPLE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, LENGTH(text) AS n_chars, string_split(text, ' ') AS toks FROM documents
), q AS (
    SELECT doc_id,
           ROUND(0.4 * LEAST(len(toks) / 50.0, 1.0)
               + 0.3 * (1.0 - len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) * 1.0 / len(toks))
               + 0.3 * LEAST(((n_chars - (len(toks) - 1) * 1.0) / len(toks)) / 8.0, 1.0), 4)
               AS quality
    FROM t
)
SELECT doc_id, quality
FROM q
WHERE CAST(('0x' || SUBSTRING(md5('qsample5:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0 < quality
"""


@register("llm_quality_weighted_sample", oracle=QUALITY_SAMPLE_ORACLE, tags=("llm", "curation", "sampling"))
def llm_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by quality: keep a doc iff a uniform md5 draw
    falls under its [0,1] quality score — high-quality docs are kept at
    ~their score's rate, engine-portably (no RNG state: the draw is a
    content hash, so the decision survives re-runs and re-partitioning).
    The uniform is bucket/2^32 — exact in binary, so the comparison is
    bit-stable on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    quality = quality_score(F.col("text"), tokens(F.col("text")))
    draw = (
        F.conv(F.substring(F.md5(F.concat(F.lit("qsample5:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        docs.select("doc_id", quality.alias("quality"), draw.alias("_u"))
        .filter(F.col("_u") < F.col("quality"))
        .select("doc_id", "quality")
    )


# --------------------------------------------------------------------------
# Domain-mixture rebalancing
# --------------------------------------------------------------------------

MIXTURE_ORACLE = """
WITH cnt AS (
    SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), frac AS (
    SELECT lang, (SELECT MIN(n) FROM cnt) * 1.0 / n AS keep_frac FROM cnt
)
SELECT d.doc_id, d.lang, ROUND(f.keep_frac, 4) AS keep_frac
FROM documents d
JOIN frac f ON f.lang = d.lang
WHERE CAST(('0x' || SUBSTRING(md5('mix9:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0 < f.keep_frac
"""


@register("llm_domain_mixture", oracle=MIXTURE_ORACLE, tags=("llm", "curation", "sampling"))
def llm_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a uniform language mixture: every language
    is hash-downsampled to the smallest language's size in expectation
    (keep_frac = min_count / count). The per-language fraction relation is
    #langs rows — broadcast by AQE; the keep decision is an md5 draw, so
    the same doc survives (or not) on every engine and every re-run. The
    filter compares the UNROUNDED fraction: an IEEE double quotient of two
    exact integer counts is correctly rounded, hence engine-identical."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    min_n = cnt.agg(F.min("n").alias("min_n"))
    frac = cnt.crossJoin(F.broadcast(min_n)).select(
        "lang", (F.col("min_n") / F.col("n")).alias("keep_frac")
    )
    draw = (
        F.conv(F.substring(F.md5(F.concat(F.lit("mix9:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(frac, "lang")
        .filter(draw < F.col("keep_frac"))
        .select("doc_id", "lang", round_to(F.col("keep_frac"), 4).alias("keep_frac"))
    )


# --------------------------------------------------------------------------
# Per-language quality-percentile filter
# --------------------------------------------------------------------------

QUALITY_MEDIAN_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang, LENGTH(text) AS n_chars, string_split(text, ' ') AS toks FROM documents
), q AS (
    SELECT doc_id, lang,
           ROUND(0.4 * LEAST(len(toks) / 50.0, 1.0)
               + 0.3 * (1.0 - len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) * 1.0 / len(toks))
               + 0.3 * LEAST(((n_chars - (len(toks) - 1) * 1.0) / len(toks)) / 8.0, 1.0), 4)
               AS quality
    FROM t
), med AS (
    SELECT lang,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY quality), 4) AS median_quality
    FROM q GROUP BY lang
)
SELECT q.doc_id, q.lang, q.quality, med.median_quality
FROM q JOIN med ON med.lang = q.lang
WHERE q.quality > med.median_quality
"""


@register("llm_quality_percentile_filter", oracle=QUALITY_MEDIAN_ORACLE, tags=("llm", "curation"))
def llm_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents above their language's median quality — per-group
    percentile thresholding (the relative-quality cut used when absolute
    score scales differ by language). One per-lang exact percentile
    aggregate (5 rows — AQE broadcasts it back), one filter; Spark's
    ``percentile`` is percentile_cont (linear interpolation), matching
    DuckDB. Both sides compare the ROUNDED median so the cut is stable."""
    docs = load_table_fanned(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", "lang", quality_score(F.col("text"), tokens(F.col("text"))).alias("quality")
    )
    med = q.groupBy("lang").agg(
        round_to(F.expr("percentile(quality, 0.5)"), 4).alias("median_quality")
    )
    return q.join(med, "lang").filter(F.col("quality") > F.col("median_quality")).select(
        "doc_id", "lang", "quality", "median_quality"
    )


# --------------------------------------------------------------------------
# Vocabulary statistics
# --------------------------------------------------------------------------

VOCAB_ORACLE = """
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS distinct_tokens,
       ROUND(COUNT(DISTINCT w) * 1.0 / COUNT(*), 4) AS type_token_ratio
FROM (
    SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS w FROM documents
)
GROUP BY source
"""


@register("llm_vocab_stats", oracle=VOCAB_ORACLE, tags=("llm", "text"))
def llm_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary richness (type-token ratio): one exploded
    aggregate with two exact count-distincts (Catalyst expands them into a
    single multi-pass aggregate — at 100 TB swap for approx_count_distinct,
    covered rows-only by agg_approx_count_distinct)."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select("source", "doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    return ex.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("w").alias("distinct_tokens"),
        round_to(F.countDistinct("w") / F.count(F.lit(1)), 4).alias("type_token_ratio"),
    )


# --------------------------------------------------------------------------
# The composed curation pipeline as one oracled query
# --------------------------------------------------------------------------

CURATED_CORPUS_ORACLE = f"""
WITH keep AS (
    SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), d AS (
    SELECT doc_id, lang, text, LENGTH(text) AS n_chars, string_split(text, ' ') AS toks
    FROM documents WHERE doc_id IN (SELECT doc_id FROM keep)
), q AS (
    SELECT doc_id, lang, text,
           ROUND(0.4 * LEAST(len(toks) / 50.0, 1.0)
               + 0.3 * (1.0 - len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) * 1.0 / len(toks))
               + 0.3 * LEAST(((n_chars - (len(toks) - 1) * 1.0) / len(toks)) / 8.0, 1.0), 4)
               AS quality
    FROM d
)
SELECT doc_id, lang,
       CASE WHEN CAST(('0x' || SUBSTRING(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
            WHEN CAST(('0x' || SUBSTRING(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split,
       quality,
       regexp_replace(
           regexp_replace(
               regexp_replace(text, '{curation.EMAIL_RE}', '<EMAIL>', 'g'),
               '{curation.PHONE_RE}', '<PHONE>', 'g'),
           '{curation.IP_RE}', '<IP>', 'g') AS text
FROM q
WHERE quality >= 0.5
"""


@register("llm_curated_corpus", oracle=CURATED_CORPUS_ORACLE, tags=("llm", "curation"))
def llm_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation pipeline (what the `curate` CLI ships) as one
    oracled query: exact dedup (min-id keeper per content hash) -> quality
    floor -> PII redaction -> deterministic 80/10/10 split. Two shuffles
    end-to-end (the dedup group-by + its semi-join); every other step is a
    per-row expression riding the same scan."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.curate_corpus(docs, min_quality=0.5)
