"""Python UDTF surface (SURVEY §2.9): one row in, many typed rows out.

The reference defines zero UDFs of any kind; the engine's §2.9 [EXT]
surface covers scalar pandas_udf, GROUPED_AGG, mapInPandas — this
module completes the triad with a user-defined TABLE function
(Spark 3.5+ ``@udtf``): ``SentenceSpans`` explodes a document into
sentences with character offsets, the row->rows shape that relational
explode cannot express when the split positions must be computed
statelessly per row but emitted with derived columns.

Scale notes: a Python UDTF is row-at-a-time across the Python boundary
— STRICTLY the slow path. It exists to cover the API surface and for
logic that genuinely needs per-row Python with table output; anything
expressible as `split`+`posexplode` (including this very sentence
split, see ``chunking.py``) should use the JVM route in a hot path.
Keep UDTFs out of per-petabyte scans; use them on already-reduced
relations.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="sentence: string, start_pos: int, end_pos: int, n_tokens: int")
class SentenceSpans:
    """Split text on sentence terminators (. ! ?), emitting each
    sentence with [start, end) character offsets and a token count.
    Offsets address the ORIGINAL string, so downstream span ops
    (redaction, highlighting) can write back losslessly."""

    def eval(self, text: str):  # noqa: ANN001 - UDTF contract
        if text is None:
            return
        start = 0
        n = len(text)
        for i in range(n):
            if text[i] in ".!?":
                seg = text[start : i + 1]
                stripped = seg.strip()
                if stripped:
                    lead = len(seg) - len(seg.lstrip())
                    s = start + lead
                    yield stripped, s, s + len(stripped), len(stripped.split())
                start = i + 1
        tail = text[start:].strip()
        if tail:
            lead = len(text[start:]) - len(text[start:].lstrip())
            s = start + lead
            yield tail, s, s + len(tail), len(tail.split())


def sentence_spans_table(spark, text: str):
    """Run the UDTF over a literal (lateral-join-free smoke path)."""
    return SentenceSpans(lit(text))
