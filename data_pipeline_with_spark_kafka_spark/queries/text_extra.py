"""Tokenization-depth queries: BPE-ish regex token counting (oracle-able)
and winnowing document fingerprints (pandas_udf — the §2.9 [EXT] vectorized
Python surface; rows-only, determinism pinned in tests/test_llm_ops.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

# Portable Java/RE2 subset: letter runs, digit runs, single punctuation.
BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_ISH}')) AS n_bpe_tokens
FROM documents
"""


@register("llm_token_count_regex", oracle=TOKEN_COUNT_ORACLE, tags=("llm", "text"))
def llm_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counting (both JVM-side)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(BPE_ISH)).alias("n_bpe_tokens"),
    )


# Winnowing parameters (Schleimer/Wilkerson/Aiken): k-char rolling hashes,
# window-of-w minima, xor-folded to one 63-bit fingerprint.
_K, _W, _BASE, _MOD = 8, 4, 257, (1 << 61) - 1


def _winnow_series(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) winnowing fingerprint — the kind of
    tokenizer-adjacent logic that genuinely needs Python; everything
    around it stays in codegen. (Wrapped by ``pandas_udf`` lazily: the
    decorator parses its DDL type and needs a live SparkSession.)"""

    def fp(text: str) -> int:
        data = text.encode("utf-8", "ignore")
        n = len(data)
        if n < _K:
            h = 0
            for ch in data:
                h = (h * _BASE + ch) % _MOD
            return h
        hashes = []
        h = 0
        power = pow(_BASE, _K - 1, _MOD)
        for i, ch in enumerate(data):
            h = (h * _BASE + ch) % _MOD
            if i >= _K:
                h = (h - data[i - _K] * power * _BASE) % _MOD
            if i >= _K - 1:
                hashes.append(h)
        out = 0
        for i in range(0, max(len(hashes) - _W + 1, 1)):
            out ^= min(hashes[i : i + _W])
        return out

    return texts.map(fp).astype("int64")


@register("llm_fingerprint_winnowing", oracle=None, tags=("llm", "text", "pandas-udf"))
def llm_fingerprint_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints over documents (pandas_udf)."""
    docs = load_table(spark, sf_dir, "documents")
    winnow_fingerprint = pandas_udf(_winnow_series, "long")
    return docs.select("doc_id", winnow_fingerprint("text").alias("winnow_fp"))


# --------------------------------------------------------------------------
# Gopher-style quality heuristics + corpus n-gram stats
# --------------------------------------------------------------------------

GOPHER_ORACLE = """
WITH toks AS (
    SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
), base AS (
    SELECT doc_id,
           len(t) AS n_tokens,
           ROUND((length(text) - (len(t) - 1)) * 1.0 / len(t), 4) AS mean_word_len
    FROM toks
), bi AS (
    SELECT doc_id,
           COUNT(*) AS total_bi,
           COUNT(DISTINCT bg) AS distinct_bi
    FROM (
        SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bg
        FROM toks, UNNEST(range(1, len(t))) AS r(i)
    )
    GROUP BY doc_id
), tf AS (
    SELECT doc_id, MAX(cnt) AS top_cnt
    FROM (
        SELECT doc_id, w, COUNT(*) AS cnt
        FROM (SELECT doc_id, UNNEST(t) AS w FROM toks)
        GROUP BY doc_id, w
    )
    GROUP BY doc_id
)
SELECT base.doc_id,
       base.n_tokens,
       base.mean_word_len,
       CASE WHEN COALESCE(bi.total_bi, 0) = 0 THEN 0.0
            ELSE ROUND(1.0 - bi.distinct_bi * 1.0 / bi.total_bi, 4) END AS dup_bigram_ratio,
       ROUND(tf.top_cnt * 1.0 / base.n_tokens, 4) AS top_token_ratio,
       (base.n_tokens BETWEEN 10 AND 1000
        AND base.mean_word_len BETWEEN 3 AND 10
        AND CASE WHEN COALESCE(bi.total_bi, 0) = 0 THEN 0.0
                 ELSE ROUND(1.0 - bi.distinct_bi * 1.0 / bi.total_bi, 4) END <= 0.6
        AND ROUND(tf.top_cnt * 1.0 / base.n_tokens, 4) <= 0.25) AS passes
FROM base
LEFT JOIN bi ON bi.doc_id = base.doc_id
JOIN tf ON tf.doc_id = base.doc_id
"""


@register("llm_quality_gopher", oracle=GOPHER_ORACLE, tags=("llm", "text"))
def llm_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/shape quality rules, all in codegen (zero
    UDFs, zero shuffles — per-row expressions only):

    - token-count and mean-word-length bounds,
    - duplicate-bigram ratio (repetition filter),
    - top-token frequency ratio (degenerate-doc filter),
    - conjunctive pass flag.

    The per-row top-token count is an O(distinct * n) expression pair —
    bounded by doc length, no explode/groupBy shuffle."""
    from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
    from data_pipeline_with_spark_kafka_spark.operators.text import shingles, tokens

    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n = F.size(t)
    mean_word_len = round_to((F.length("text") - (n - F.lit(1))) / n, 4)
    all_bi = shingles(t, 2, distinct=False)
    total_bi = F.size(all_bi)
    distinct_bi = F.size(F.array_distinct(all_bi))
    dup_ratio = F.when(total_bi <= 0, F.lit(0.0)).otherwise(
        round_to(F.lit(1.0) - distinct_bi / total_bi, 4)
    )
    top_cnt = F.array_max(
        F.transform(F.array_distinct(t), lambda w: F.size(F.filter(t, lambda y: y == w)))
    )
    top_ratio = round_to(top_cnt / n, 4)
    passes = (
        n.between(10, 1000)
        & mean_word_len.between(3, 10)
        & (dup_ratio <= 0.6)
        & (top_ratio <= 0.25)
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        dup_ratio.alias("dup_bigram_ratio"),
        top_ratio.alias("top_token_ratio"),
        passes.alias("passes"),
    )


TOP_BIGRAMS_ORACLE = """
SELECT bg AS bigram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (
    SELECT t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bg
    FROM (SELECT string_split(text, ' ') AS t FROM documents),
         UNNEST(range(1, len(t))) AS r(i)
)
GROUP BY bg
ORDER BY cnt DESC, bigram
LIMIT 50
"""


@register("llm_top_bigrams", oracle=TOP_BIGRAMS_ORACLE, tags=("llm", "text"))
def llm_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 bigram frequencies (vocabulary/contamination
    analysis): explode non-distinct bigrams, one partial-aggregated count
    shuffle, TakeOrderedAndProject top-k (no global sort). Ties broken on
    the bigram string so the LIMIT is deterministic on both engines."""
    from data_pipeline_with_spark_kafka_spark.operators.text import shingles, tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(shingles(tokens(F.col("text")), 2, distinct=False)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(50)
    )
