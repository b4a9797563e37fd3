"""BPE vocabulary-induction tests: the DataFrame training loop must agree
merge-for-merge with a pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

from data_pipeline_with_spark_kafka_spark.operators import bpe


def python_bpe(word_counts: dict[str, int], num_merges: int):
    """Reference implementation (Sennrich-style, word-frequency table)."""
    table = {w: list(w) + [bpe.END_OF_WORD] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in table.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        # max count, ties broken lexicographically on (a, b)
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        for w, syms in table.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            table[w] = out
    return merges


def test_bpe_matches_python_reference(spark):
    corpus = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
        "low newer wide lowest",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    words: Counter = Counter()
    for line in corpus:
        words.update(line.split())

    expected = python_bpe(dict(words), num_merges=12)
    got = bpe.train_bpe(docs, "text", num_merges=12)
    assert got == expected, (got, expected)


def test_bpe_segmentation_is_consistent(spark):
    docs = spark.createDataFrame(
        [(0, "banana bandana banana banana bandana")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, "text", num_merges=8)
    assert merges
    seg = bpe.segment_word("banana", merges)
    # re-joining the segmentation reproduces the word (+ end marker)
    assert "".join(seg) == "banana" + bpe.END_OF_WORD
    # the most frequent word compresses below character length
    assert len(seg) < len("banana") + 1


def test_bpe_distributed_path_equals_driver_path(spark):
    """Forcing the distributed loop (driver_limit=0) must yield the exact
    same merges as the driver-side path."""
    docs = spark.createDataFrame(
        [(0, "low lower lowest low"), (1, "new newer newest new new")],
        "doc_id long, text string",
    )
    fast = bpe.train_bpe(docs, "text", num_merges=8)
    distributed = bpe.train_bpe(docs, "text", num_merges=8, driver_limit=0)
    assert fast == distributed
