"""Property tests for the curation operators (PII redaction,
contamination, shared spans, packing) beyond the oracle-differential
checks in test_queries_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators import curation


def test_redaction_leaves_no_pii_behind(spark):
    rows = [
        (1, "mail me at alice.smith+x@sub.example.org today"),
        (2, "call +44-207-946123 or +1-555-0042 now"),
        (3, "host 192.168.0.1 and 10.0.0.255 are up"),
        (4, "mixed bob@x.io at 172.16.254.3 phone +1-800-555"),
        (5, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    red = df.select("doc_id", curation.redact_pii(F.col("t")).alias("r"))
    leftovers = red.filter(
        F.regexp_count("r", F.lit(curation.EMAIL_RE))
        + F.regexp_count("r", F.lit(curation.PHONE_RE))
        + F.regexp_count("r", F.lit(curation.IP_RE))
        > 0
    ).collect()
    assert leftovers == []
    r4 = {r.doc_id: r.r for r in red.collect()}
    assert "<EMAIL>" in r4[1] and "<PHONE>" in r4[2] and "<IP>" in r4[3]
    assert r4[5] == "clean text with no pii at all"


def test_contamination_copied_doc_is_fully_overlapping(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # verbatim copy
            (2, "totally different words here entirely now"),
            (3, "xy"),  # < k tokens: no shingles
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in curation.contamination_overlap(
            corpus, bench, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    assert out[1].overlap_frac == 1.0 and out[1].contaminated
    assert out[2].overlap_frac == 0.0 and not out[2].contaminated
    assert out[3].n_shingles == 0 and out[3].overlap_frac == 0.0


def test_shared_span_fraction_detects_duplicated_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven"),
            (2, "one two three four five six seven"),  # exact dup of 1
            (3, "eight nine ten eleven twelve thirteen fourteen"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in curation.shared_span_fraction(docs, "doc_id", "text", k=5).collect()
    }
    assert out[1].shared_frac == 1.0 and out[1].templated
    assert out[2].shared_frac == 1.0
    assert out[3].shared_frac == 0.0 and not out[3].templated


def test_pack_sequences_offsets_are_contiguous_per_shard(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(200)], "doc_id long, text string"
    )
    placed = curation.pack_sequences(
        docs, "doc_id", F.size(F.split("text", " ")), num_shards=4, budget=16
    ).collect()
    by_shard: dict[int, list] = {}
    for r in placed:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(placed) == 200
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.offset_start)
        expect = 0
        for r in rows:
            assert r.offset_start == expect, (shard, r)
            assert r.bin_id == r.offset_start // 16
            expect += r.n_tokens
