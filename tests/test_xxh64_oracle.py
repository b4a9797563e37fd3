"""The pure-SQL XXH64 compiler is pinned at three layers:

1. Python reference (tools/xxh64_ref.py) == Spark's ``xxhash64`` —
   the semantics source of truth, across every byte-length class
   (empty, tail-only, 4-byte, 8-byte words, >=32B stripes, multi-stripe,
   multibyte UTF-8) and the long/int chaining rules.
2. Compiled DuckDB SQL (queries/xxh64_sql.py) == Python reference —
   exhaustive length fuzz 0..130 bytes plus stripe-boundary giants.
3. The registered oracles (queries/xxh64_oracles.py) == the Spark
   production tiers end-to-end (tests/test_queries_parity.py covers
   this at sf0.001 for llm_dedup_simhash / llm_dedup_minhash_lsh /
   llm_sim_topk_lsh; here we pin the hash relation itself on corpus
   tokens so a divergence localizes to the hash, not the pipeline).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.queries.xxh64_sql import (
    long_hash_wrap,
    long_pair_hash_wrap,
    long_rehash_wrap,
    string_hash_ctes,
)
from tools.xxh64_ref import spark_xxhash64, xxh64_bytes

SPARK_SEED = 42

CRAFTED = [
    "",
    "a",
    "abc",
    "abcd",
    "hello w",
    "hello wo",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 63,
    "x" * 64,
    "x" * 65,
    "x" * 1000,
    "héllo wörld",
    "日本語テキストの長いサンプル文章です",
    "emoji 🎉🔥 mix",
    "it's \"quoted\" \\ backslash\ttab",
]


def _fuzz_strings() -> list[str]:
    rnd = random.Random(7)
    alpha = "abcdefghij XYZ0123éü日🎉"
    out = list(CRAFTED)
    for length in range(131):
        out.append("".join(rnd.choice(alpha) for _ in range(length)))
    return list(dict.fromkeys(out))


def test_python_ref_matches_spark(spark):
    cases = _fuzz_strings()[:60]
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for c in cases:
        assert got[c] == spark_xxhash64(c), repr(c)


def test_python_ref_matches_spark_long_chains(spark):
    longs = [0, 1, -1, 42, 2**62, -(2**62), 123456789012345]
    df = spark.createDataFrame([(l, i) for l in longs for i in range(4)], ["l", "i"])
    df = df.withColumn("i", F.col("i").cast("int"))
    rows = df.select(
        "l",
        "i",
        F.xxhash64("l").alias("h1"),
        F.xxhash64("l", "i").alias("h2"),
        F.xxhash64("l", F.lit(7).cast("long")).alias("h3"),
    ).collect()
    for r in rows:
        assert r["h1"] == spark_xxhash64(("long", r["l"]))
        assert r["h2"] == spark_xxhash64(("long", r["l"]), ("int", r["i"]))
        assert r["h3"] == spark_xxhash64(("long", r["l"]), ("long", 7))


def test_sql_string_hash_matches_reference():
    cases = _fuzz_strings()
    con = duckdb.connect()
    con.execute("CREATE TABLE strs(s VARCHAR)")
    con.executemany("INSERT INTO strs VALUES (?)", [(c,) for c in cases])
    got = dict(
        con.execute(
            "WITH RECURSIVE "
            + string_hash_ctes("xh", "strs", "s").lstrip()
            + "\nSELECT s, h FROM xh_h"
        ).fetchall()
    )
    for s in cases:
        assert int(got[s]) == xxh64_bytes(s.encode(), SPARK_SEED), repr(s)


def test_sql_long_paths_match_reference():
    rnd = random.Random(3)
    vals = [(rnd.getrandbits(64), seed) for seed in range(32) for _ in range(3)]
    con = duckdb.connect()
    con.execute("CREATE TABLE lv(v HUGEINT, sd INTEGER)")
    con.executemany("INSERT INTO lv VALUES (?, ?)", vals)

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    sql, res = long_hash_wrap("SELECT v FROM lv", "v")
    for v, h in con.execute(f"SELECT v, {res} FROM ({sql}) f").fetchall():
        assert int(h) == spark_xxhash64(("long", signed(int(v)))) % 2**64

    sql, res = long_rehash_wrap("SELECT v, sd FROM lv", "v", "sd")
    for v, sd, h in con.execute(f"SELECT v, sd, {res} FROM ({sql}) f").fetchall():
        exp = spark_xxhash64(("long", signed(int(v))), ("int", sd)) % 2**64
        assert int(h) == exp

    sql, res = long_pair_hash_wrap(
        "SELECT v, CAST(sd AS HUGEINT) * 1234567 AS v2 FROM lv", "v", "v2"
    )
    for a, b, h in con.execute(f"SELECT v, v2, {res} FROM ({sql}) f").fetchall():
        exp = spark_xxhash64(("long", signed(int(a))), ("long", signed(int(b)))) % 2**64
        assert int(h) == exp


def test_sql_hash_matches_spark_on_corpus_tokens(spark, duck, sf_dir):
    """The hash relation itself on real corpus tokens: any oracle
    divergence on the dedup tiers localizes to pipeline mirroring, not
    the hash."""
    tok = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .select("t", F.xxhash64("t").alias("h"))
    )
    sp = {(r["t"], r["h"]) for r in tok.collect()}
    got = duck.execute(
        "WITH RECURSIVE toks AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS t FROM documents), "
        + string_hash_ctes("xh", "toks", "t").lstrip()
        + "\nSELECT t, h FROM xh_h"
    ).fetchall()
    du = {(t, int(h) - (1 << 64)) if int(h) >= (1 << 63) else (t, int(h)) for t, h in got}
    assert sp == du


@pytest.mark.parametrize("token", ["", " ", "  ", "x"])
def test_degenerate_tokens_hash_consistently(token):
    con = duckdb.connect()
    con.execute("CREATE TABLE strs(s VARCHAR)")
    con.execute("INSERT INTO strs VALUES (?)", [token])
    got = con.execute(
        "WITH RECURSIVE "
        + string_hash_ctes("xh", "strs", "s").lstrip()
        + "\nSELECT h FROM xh_h"
    ).fetchone()[0]
    assert int(got) == xxh64_bytes(token.encode(), SPARK_SEED)


def test_oracles_on_multistripe_corpus(spark, duck, tmp_path):
    """The driver corpus's shingles are all < 32 B (tail-only path); this
    synthetic corpus of long multibyte tokens pushes most shingles
    through the recursive stripe loop (>=32 B, many >=64 B = multiple
    iterations) inside the FULL production pipelines, not just the
    unit-level length fuzz."""
    import os
    import random

    import duckdb as _duckdb

    from data_pipeline_with_spark_kafka_spark.operators import dedup
    from data_pipeline_with_spark_kafka_spark.queries.xxh64_oracles import (
        minhash_lsh_xxh64_oracle,
        simhash_xxh64_oracle,
    )
    from tests.oracle_compare import normalize

    rnd = random.Random(99)
    words = [
        "internationalization", "противоположность", "自然言語処理モデル",
        "🎉superlongtoken🎉", "floccinaucinihilipilification", "a", "bb", "ccc",
    ]
    rows = [
        (i, " ".join(rnd.choice(words) for _ in range(rnd.randint(1, 30))), "en", 100)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    path = os.path.join(str(tmp_path), "documents.parquet")
    df.coalesce(1).write.parquet(path)
    docs = spark.read.parquet(path)
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    n32 = con.execute(
        """WITH toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        shd AS (SELECT DISTINCT t[CAST(i AS INT)]||' '||t[CAST(i AS INT)+1]||' '||t[CAST(i AS INT)+2] s
                FROM toks, UNNEST(range(1,len(t)-1)) r(i))
        SELECT SUM(CASE WHEN octet_length(encode(s))>=64 THEN 1 ELSE 0 END) FROM shd"""
    ).fetchone()[0]
    assert n32 > 100  # the multi-stripe loop is genuinely engaged

    sp = normalize(
        dedup.minhash_lsh_pairs(docs, "doc_id", "text", k=3, threshold=0.8).toPandas()
    )
    du = normalize(con.execute(minhash_lsh_xxh64_oracle()).df())
    assert sp == du

    sp = normalize(dedup.simhash(docs, "doc_id", "text").toPandas())
    du = normalize(con.execute(simhash_xxh64_oracle()).df())
    assert sp == du
