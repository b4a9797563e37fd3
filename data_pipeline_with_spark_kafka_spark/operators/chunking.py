"""Document chunking: split each document into fixed-size token windows
with a configurable stride (overlap) — the standard pre-embedding /
pre-tokenization step of an LLM data pipeline (every chunk carries its
provenance so downstream stages can join back to the source doc).

Pure expression-tree implementation: tokenize once, explode a
``sequence`` of window starts, ``slice`` the token array per window.
No UDF, no shuffle — chunking is embarrassingly parallel and stays
inside whole-stage codegen; output row count is
ceil(max(n_tokens - size, 0) / stride) + 1 per doc.

Semantics pinned by the DuckDB oracle of the registered query
(queries/llm_fast_paths.py::llm_chunk_documents):

- every doc yields at least one chunk (short docs yield themselves);
- the last window is allowed to be short (no padding, no drop) —
  training pipelines that need exact-length blocks compose this with
  ``llm_sequence_packing``;
- windows start at 0, stride, 2*stride, ... and stop as soon as a window
  covers the tail (start + size >= n_tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens) — token windows of ``size``
    every ``stride`` tokens (default: no overlap, stride = size)."""
    if size <= 0:
        raise ValueError("size must be positive")
    stride = size if stride is None else stride
    if not 0 < stride <= size:
        raise ValueError("stride must be in (0, size]")

    # NULL-text docs yield no chunks (there is nothing to window; both
    # engines otherwise disagree on how NULL propagates through the
    # window arithmetic — round-8 all-NULL edge corpus).
    df = df.filter(F.col(text_col).isNotNull())
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # Number of windows: 1 + ceil(max(n - size, 0) / stride). The greatest()
    # keeps single-window (short) docs at exactly one chunk.
    n_chunks = (
        F.lit(1) + F.ceil(F.greatest(n - F.lit(size), F.lit(0)) / F.lit(stride))
    ).cast("int")
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "_w"),
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(
                " ", F.slice("_toks", F.col("_w") * stride + 1, size)
            ).alias("chunk_text"),
            F.least(
                F.lit(size), F.size("_toks") - F.col("_w") * F.lit(stride)
            ).alias("n_tokens"),
        )
    )
