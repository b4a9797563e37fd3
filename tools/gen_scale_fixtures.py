"""Generate LARGER documents/embeddings fixtures for the dedup/ANN scale
curve (round-3 verdict item 5).

The driver's testdata tops out at sf0.1 (5k documents / 2k embeddings) and
is read-only, so every 100-TB scaling claim was argued from plan shape
alone. This generator extends the driver's conventions (seeded synthetic
word-salad text over the same vocabulary style, 64-d label-clustered float
embeddings, same schemas) to sfN-equivalent row counts under
``/root/repo/fixtures/scale/`` so the curve can actually be MEASURED at
multiple scales:

    python tools/gen_scale_fixtures.py            # sf0.5 and sf1.0
    python tools/gen_scale_fixtures.py 0.2 2.0    # custom scale list

Only the two corpus tables are generated (the dedup/ANN tiers touch
nothing else). Distribution matches the sf0.1 profile: ~40% en and the
rest split across de/es/fr/zh, 20 uniform sources, n_chars ~44-580,
a small exact-duplicate tail plus a near-duplicate tail (edit a few
tokens), and 10 Gaussian label clusters for embeddings.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data vector "
    "cache shuffle join scale plan stage task node disk memory"
).split()

LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]

DOCS_PER_SF = 50_000  # sf0.1 -> 5_000, matching the driver's testdata
VECS_PER_SF = 20_000
EVENTS_PER_SF = 1_000_000  # sf0.1 -> 100_000, matching the driver's testdata
USERS_PER_SF = 15_000  # sf0.1 -> 1_500, matching the driver (users scale with sf)
EVENT_TYPES = ["click", "view", "purchase", "search", "share"]
DIM = 64
N_LABELS = 10


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    n_base = int(n * 0.9)
    texts: list[str] = []
    for _ in range(n_base):
        length = int(rng.integers(8, 60))
        texts.append(" ".join(rng.choice(VOCAB, size=length)))
    # Exact-duplicate tail (~5%) and near-duplicate tail (~5%, a few tokens
    # swapped) so every dedup tier has real work at every scale.
    while len(texts) < n:
        src = texts[int(rng.integers(0, n_base))]
        if rng.random() < 0.5:
            texts.append(src)
        else:
            toks = src.split()
            for _ in range(max(1, len(toks) // 20)):
                toks[int(rng.integers(0, len(toks)))] = str(rng.choice(VOCAB))
            texts.append(" ".join(toks))
    order = rng.permutation(n)
    texts = [texts[i] for i in order]
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(rng.choice(LANGS, size=n, p=LANG_P), type=pa.string()),
            "source": pa.array([f"src{i % 20}" for i in rng.integers(0, 20, size=n)], type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    centroids = rng.normal(0.0, 1.0, size=(N_LABELS, DIM))
    labels = rng.integers(0, N_LABELS, size=n)
    vecs = centroids[labels] + rng.normal(0.0, 0.35, size=(n, DIM))
    # Near-duplicate tail: ~2% of vectors are tiny perturbations of another
    # vector in the SAME label cluster (cosine > 0.99).
    n_dup = n // 50
    src_idx = rng.integers(0, n - n_dup, size=n_dup)
    vecs[n - n_dup :] = vecs[src_idx] + rng.normal(0.0, 0.005, size=(n_dup, DIM))
    labels[n - n_dup :] = labels[src_idx]
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs], type=pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), type=pa.int32()),
        }
    )


def gen_events(n: int, n_users: int, rng: np.random.Generator) -> pa.Table:
    """Same shape as the driver's events table (30-day span, per-user
    irregular arrivals) so the time-series/sessionization operators can
    be scale-measured. Timestamps are microsecond (the loader's ns
    normalization is a no-op on them)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base + rng.integers(0, span_us, size=n).astype("timedelta64[us]")
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n), type=pa.int64()),
            "event_type": pa.array(rng.choice(EVENT_TYPES, size=n)),
            "value": pa.array(rng.gamma(2.0, 10.0, size=n)),
            "props": pa.array([None] * n, type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# TPC-H-profile twins (round-8 verdict task #5): same schemas, key ranges,
# and categorical vocabularies as the driver's seed-invariant TPC-H tables
# (profiled from /root/testdata/sf0.01), fresh value draws per seed — so the
# ~80 relational/stats queries stop being single-dataset-verified. The
# differential harness reads the SAME files on both engines, so distribution
# fidelity only matters for keeping filters/joins non-degenerate.
# ---------------------------------------------------------------------------

REGION_NAMES = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
CUST_PER_SF = 150_000
SUPP_PER_SF = 10_000
PART_PER_SF = 200_000
ORDERS_PER_SF = 1_500_000
LINEITEM_PER_SF = 6_000_000


def _dates(rng, n, start: str, end: str):
    s = np.datetime64(start, "D")
    days = int((np.datetime64(end, "D") - s) / np.timedelta64(1, "D"))
    return (s + rng.integers(0, days + 1, size=n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def gen_tpch(sf: float, out: str, rng: np.random.Generator) -> None:
    """Write the seven TPC-H-shaped tables for one scale factor."""
    n_cust = int(CUST_PER_SF * sf)
    n_supp = int(SUPP_PER_SF * sf)
    n_part = int(PART_PER_SF * sf)
    n_ord = int(ORDERS_PER_SF * sf)
    n_li = int(LINEITEM_PER_SF * sf)

    def w(name, table):
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": pa.array(REGION_NAMES),
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, size=n_cust)),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n_supp), 2)),
    }))
    adj = rng.choice(P_ADJ, size=n_part)
    noun = rng.choice(P_NOUN, size=n_part)
    w("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, size=n_part)]),
        "p_type": pa.array(rng.choice(P_TYPES, size=n_part)),
        "p_size": pa.array(rng.integers(1, 51, size=n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, size=n_part), 2)),
    }))
    w("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord)),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], size=n_ord, p=[0.49, 0.49, 0.02])),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, size=n_ord), 2)),
        "o_orderdate": pa.array(_dates(rng, n_ord, "1995-01-01", "2001-08-01"),
                                type=pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, size=n_ord)),
    }))
    w("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, size=n_li)),
        "l_partkey": pa.array(rng.integers(0, n_part, size=n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li)),
        "l_linenumber": pa.array(rng.integers(1, 8, size=n_li).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, size=n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, size=n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, size=n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, size=n_li) / 100.0, 2)),
        "l_returnflag": pa.array(rng.choice(["R", "A", "N"], size=n_li, p=[0.25, 0.25, 0.5])),
        "l_linestatus": pa.array(rng.choice(["O", "F"], size=n_li)),
        "l_shipdate": pa.array(_dates(rng, n_li, "1995-01-02", "2001-11-04"),
                               type=pa.timestamp("us")),
    }))


def generate(sf: float, out: str, *, seed: int = 42) -> None:
    """Write documents/embeddings/events parquet for one scale factor.

    ``seed`` parameterizes the whole corpus (round-7 seed-differential
    fuzz: every correctness claim otherwise rides one seed-42 dataset, so
    an oracle and query sharing a seed-specific accident would be
    invisible)."""
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_docs, n_vecs = int(DOCS_PER_SF * sf), int(VECS_PER_SF * sf)
    pq.write_table(gen_documents(n_docs, rng), os.path.join(out, "documents.parquet"))
    pq.write_table(gen_embeddings(n_vecs, rng), os.path.join(out, "embeddings.parquet"))
    n_events = int(EVENTS_PER_SF * sf)
    n_users = int(USERS_PER_SF * sf)
    pq.write_table(gen_events(n_events, n_users, rng), os.path.join(out, "events.parquet"))
    # TPC-H relations too (round-9: the sf0.5/sf1 correctness sweeps now
    # cover the FULL oracled registry, so the relational queries need
    # their tables at these scales). Independent rng stream so the three
    # tables above stay byte-identical to the pre-round-9 fixtures.
    gen_tpch(sf, out, np.random.default_rng(seed + 7_000_003))
    print(
        f"wrote {out}: {n_docs} documents, {n_vecs} embeddings, {n_events} events, "
        f"tpch sf{sf:g} (seed={seed})"
    )


def main() -> None:
    sfs = [float(a) for a in sys.argv[1:]] or [0.5, 1.0]
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "scale")
    for sf in sfs:
        generate(sf, os.path.join(root, f"sf{sf:g}"), seed=42)


if __name__ == "__main__":
    main()
