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
    print(f"wrote {out}: {n_docs} documents, {n_vecs} embeddings, {n_events} events (seed={seed})")


def main() -> None:
    sfs = [float(a) for a in sys.argv[1:]] or [0.5, 1.0]
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "scale")
    for sf in sfs:
        generate(sf, os.path.join(root, f"sf{sf:g}"), seed=42)


if __name__ == "__main__":
    main()
