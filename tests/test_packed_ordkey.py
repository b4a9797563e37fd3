"""Regression: the (acctbal, custkey) packed ordering key used by
agg_min_by_max_by must keep balance dominant over custkey for keys far
beyond 100k (TPC-H sf>=1 has 150k+ customers; sf100 has 15M).

The old packing (acctbal * 1e7 + custkey) broke at custkey >= 100_000:
a 1-cent balance gap spanned only 1e5 in the packed key, so a large
custkey could outrank a higher balance — and the cross-engine oracle
shared the bug, so the parity check couldn't see it."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pack(acctbal_col, custkey_col):
    # mirror of queries/stats_extra.py::agg_min_by_max_by
    return F.round(acctbal_col * 100, 0) * 1_000_000_000 + custkey_col


def test_balance_dominates_large_custkey(spark):
    # customer 9_999_999 (sf ~66 territory) has 1 cent LESS than
    # customer 1 — the richer low-key customer must win max_by.
    rows = [
        (1, "low-key-richer", 5000.01),
        (9_999_999, "high-key-poorer", 5000.00),
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string, c_acctbal double")
    ordkey = _pack(F.col("c_acctbal"), F.col("c_custkey"))
    got = df.agg(
        F.max_by("c_name", ordkey).alias("richest"),
        F.min_by("c_name", ordkey).alias("poorest"),
    ).first()
    assert got.richest == "low-key-richer"
    assert got.poorest == "high-key-poorer"


def test_ties_break_by_custkey_and_stay_exact(spark):
    # equal balances -> higher custkey wins max_by; packed values are
    # exact doubles (< 2^53) so no float fuzz flips the order.
    rows = [(k, f"c{k}", 9999.99) for k in (1, 123_456_789, 999_999_999)]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string, c_acctbal double")
    ordkey = _pack(F.col("c_acctbal"), F.col("c_custkey"))
    got = df.agg(
        F.max_by("c_name", ordkey).alias("hi"),
        F.min_by("c_name", ordkey).alias("lo"),
    ).first()
    assert got.hi == "c999999999"
    assert got.lo == "c1"
    # exactness bound: max packed value fits well under 2^53
    assert 9999.99 * 100 * 1_000_000_000 + 999_999_999 < 2**53


def test_adjacent_cent_values_never_collide(spark):
    # adversarial sweep: random balances one cent apart with huge keys,
    # packed ordering must equal tuple ordering (balance, custkey).
    import random

    rng = random.Random(42)
    rows = []
    for i in range(200):
        bal = round(rng.uniform(-999.99, 9999.99), 2)
        rows.append((rng.randrange(1, 10**9), f"r{i}", bal))
        rows.append((rng.randrange(1, 10**9), f"s{i}", round(bal + 0.01, 2)))
    df = spark.createDataFrame(rows, "c_custkey long, c_name string, c_acctbal double")
    ordkey = _pack(F.col("c_acctbal"), F.col("c_custkey"))
    got = df.agg(F.max_by("c_name", ordkey).alias("hi")).first().hi
    expect = max(rows, key=lambda r: (r[2], r[0]))[1]
    assert got == expect
