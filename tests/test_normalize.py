"""Unicode NFC normalization: the pandas-UDF slow path is hash-verified
against DuckDB's utf8proc implementation — pinned here on the hard
cases (combining marks, Hangul jamo composition, NON-changes that NFKC
would make but NFC must not, multi-mark stacking), plus the audit
projection's NULL and byte-count semantics."""

from __future__ import annotations

import unicodedata

import duckdb

from data_pipeline_with_spark_kafka_spark.operators.normalize import nfc_audit_columns

CASES = [
    "café",                # e + combining acute -> é
    "café",                 # already NFC: unchanged
    "각",        # Hangul jamo -> 각 (syllable composition)
    "ＡBC",                  # fullwidth A: NFC must NOT fold (that's NFKC)
    "á̂̃",       # stacked combining marks (canonical ordering)
    "Å",                    # ANGSTROM SIGN -> Å (canonical singleton)
    "plain ascii text",
    "",
    "日本語 🎉",
]


def test_python_nfc_matches_duckdb():
    con = duckdb.connect()
    for s in CASES:
        got = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert got == unicodedata.normalize("NFC", s), repr(s)


def test_nfc_audit_projection(spark):
    rows = [(i, s) for i, s in enumerate(CASES)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["nfc_changed"], r["bytes_raw"], r["bytes_nfc"])
        for r in df.select("doc_id", *nfc_audit_columns("text")[1:]).collect()
    }
    for i, s in enumerate(CASES):
        norm = unicodedata.normalize("NFC", s)
        assert out[i][0] == (norm != s), repr(s)
        assert out[i][1] == len(s.encode())
        assert out[i][2] == len(norm.encode())
    assert out[99] == (False, None, None)  # NULL text: unchanged-by-contract

    # the composing cases genuinely shrink
    assert out[0][2] < out[0][1]   # combining acute composed
    assert out[2][2] < out[2][1]   # jamo composed
    # NFC is not NFKC: fullwidth A survives
    assert out[3][0] is False
