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
