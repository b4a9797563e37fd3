"""Unicode text normalization — the canonical first stage of a
multilingual training-data pipeline (mixed NFC/NFD sources hash and
dedup differently for VISUALLY identical text until normalized).

Spark exposes no unicode-normalization builtin, so this is the
documented Python slow path done right: an Arrow-batched pandas UDF
(`unicodedata.normalize`), never row-at-a-time over py4j. Cross-engine
verification is exact anyway: DuckDB's ``nfc_normalize`` (utf8proc) and
CPython's ``unicodedata`` implement the same stable normalization
(Unicode's normalization-stability policy freezes composition for
assigned codepoints), pinned in tests/test_normalize.py on
combining-mark, Hangul-jamo, and compatibility cases.

Scale shape: map-only (zero shuffle) — the UDF cost is linear in bytes
and embarrassingly parallel; at 100 TB this runs as part of the first
scan, exactly like the codec UDFs in operators/multimodal.py.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


# StringType() (not the "string" DDL form): the DDL string is parsed
# eagerly at decoration time and requires an active SparkContext, which
# would make this module un-importable sessionless.
@pandas_udf(StringType())
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    return s.map(
        lambda v: unicodedata.normalize("NFC", v) if isinstance(v, str) else v
    )


def nfc_audit_columns(text_col: str | Column) -> list[Column]:
    """(nfc_text, changed, bytes_raw, bytes_nfc) — the audit projection
    used by the registered query. Byte lengths (octet_length on the
    oracle side) are the unambiguous size measure: code-point and
    grapheme counts disagree between engines by design."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    nfc = nfc_normalize_udf(text)
    return [
        nfc.alias("nfc_text"),
        (~(nfc.eqNullSafe(text))).alias("nfc_changed"),
        F.octet_length(text).alias("bytes_raw"),
        F.octet_length(nfc).alias("bytes_nfc"),
    ]
