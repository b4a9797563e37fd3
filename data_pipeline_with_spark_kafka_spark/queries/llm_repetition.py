"""Repetition-filter queries: Gopher-style per-doc repetition metrics and
C4-style corpus-level segment dedup, both fully DuckDB-oracled.

The corpus has no newlines, so the "line" unit is a fixed 10-token
segment (``operators/repetition.py``); the oracle SQL mirrors the
segmenter with inclusive list slices over ``generate_series``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.repetition import (
    SEGMENT_WIDTH,
    dedup_corpus_segments,
    repetition_metrics,
)
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table, load_table_fanned

W = SEGMENT_WIDTH

# Shared oracle CTEs: tokenize, segment (1-based inclusive slices — the
# tail segment clips, like Spark's F.slice), positional n-grams.
_SEG_CTES = f"""
toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
idx AS (
    SELECT doc_id, t,
           unnest(generate_series(1, CAST(ceil(len(t) / {W}.0) AS BIGINT))) AS i
    FROM toks
),
segs AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(t[(i - 1) * {W} + 1 : (i - 1) * {W} + {W}], ' ') AS seg
    FROM idx
)
"""

REPETITION_ORACLE = f"""
WITH {_SEG_CTES},
seg_occ AS (SELECT doc_id, seg, count(*) AS cnt FROM segs GROUP BY 1, 2),
seg_stats AS (
    SELECT doc_id,
           sum(cnt) AS n_segs,
           sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_segs,
           sum(cnt * length(seg)) AS seg_chars,
           sum(CASE WHEN cnt > 1 THEN cnt * length(seg) ELSE 0 END) AS dup_seg_chars
    FROM seg_occ GROUP BY 1
),
big_occ AS (
    SELECT doc_id, array_to_string(t[i : i + 1], ' ') AS gram, count(*) AS cnt
    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
    GROUP BY 1, 2
),
top_big AS (SELECT doc_id, max(cnt * length(gram)) AS top_bigram_chars FROM big_occ GROUP BY 1),
five_occ AS (
    SELECT doc_id, array_to_string(t[i : i + 4], ' ') AS gram, count(*) AS cnt
    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i FROM toks)
    GROUP BY 1, 2
),
five_stats AS (
    SELECT doc_id, count(*) AS n_5grams,
           sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS dup_5grams
    FROM five_occ GROUP BY 1
)
SELECT d.doc_id,
       CAST(s.n_segs AS BIGINT) AS n_segs,
       round(s.dup_segs * 1.0 / s.n_segs, 4) AS dup_seg_frac,
       round(s.dup_seg_chars * 1.0 / s.seg_chars, 4) AS dup_seg_char_frac,
       round(coalesce(b.top_bigram_chars * 1.0 / length(d.text), 0.0), 4)
           AS top_bigram_char_frac,
       round(coalesce(f.dup_5grams * 1.0 / f.n_5grams, 0.0), 4) AS dup_5gram_frac
FROM documents d
LEFT JOIN seg_stats s USING (doc_id)
LEFT JOIN top_big b USING (doc_id)
LEFT JOIN five_stats f USING (doc_id)
"""


@register("llm_repetition_metrics", oracle=REPETITION_ORACLE, tags=("llm", "text", "quality"))
def llm_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, A1) over segments/n-grams."""
    return repetition_metrics(load_table(spark, sf_dir, "documents"))


SEGMENT_DEDUP_ORACLE = f"""
WITH {_SEG_CTES},
ranked AS (
    SELECT doc_id, pos, seg,
           row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
    FROM segs
),
rebuilt AS (
    SELECT doc_id,
           string_agg(seg, ' ' ORDER BY pos) AS text_clean,
           count(*) AS n_kept
    FROM ranked WHERE rn = 1 GROUP BY doc_id
),
totals AS (SELECT doc_id, CAST(ceil(len(t) / {W}.0) AS BIGINT) AS n_segs FROM toks)
SELECT t.doc_id,
       coalesce(r.text_clean, '') AS text_clean,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       -- coalesce(n_segs): NULL text has 0 segments, not NULL arithmetic
       CAST(coalesce(t.n_segs, 0) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


@register(
    "llm_dedup_corpus_segments", oracle=SEGMENT_DEDUP_ORACLE, tags=("llm", "dedup", "text")
)
def llm_dedup_corpus_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level (here: segment-level) corpus dedup — keep each
    segment text only at its global first occurrence, rebuild docs."""
    return dedup_corpus_segments(load_table_fanned(spark, sf_dir, "documents"))


REMOVE_SPANS_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
    SELECT doc_id, CAST(i AS INT) AS pos,
           array_to_string(t[CAST(i AS INT) + 1 : CAST(i AS INT) + 10], ' ') AS g
    FROM toks, UNNEST(range(0, GREATEST(len(t) - 9, 0))) r(i)
),
rep AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1),
marked AS (SELECT doc_id, pos FROM grams JOIN rep USING (g)),
tok_idx AS (
    SELECT doc_id, CAST(i AS INT) AS i, t[CAST(i AS INT) + 1] AS tok
    FROM toks, UNNEST(range(0, len(t))) r(i)
),
kept AS (
    SELECT ti.doc_id, ti.i, ti.tok
    FROM tok_idx ti
    WHERE NOT EXISTS (SELECT 1 FROM marked m
                      WHERE m.doc_id = ti.doc_id
                        AND m.pos <= ti.i AND ti.i < m.pos + 10)
),
agg AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS cleaned_text,
           COUNT(*) AS n_kept
    FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.cleaned_text, '') AS cleaned_text,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(string_split(d.text, ' ')) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@register("llm_remove_repeated_spans", oracle=REMOVE_SPANS_ORACLE, tags=("llm", "dedup", "spans"))
def llm_remove_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee-et-al-style exact repeated-span removal (k=10 token grams):
    every token covered by a 10-gram that occurs in more than one document
    is dropped from all of them. The DuckDB oracle recomputes it with
    string grams + NOT EXISTS — an independent algorithm over the same
    semantics (`operators/repetition.remove_repeated_spans`)."""
    from data_pipeline_with_spark_kafka_spark.operators.repetition import (
        remove_repeated_spans,
    )

    docs = load_table_fanned(spark, sf_dir, "documents")
    return remove_repeated_spans(docs, "doc_id", "text", k=10)
