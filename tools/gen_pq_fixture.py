"""Materialize the product-quantization codebooks as a committed fixture.

PQ (Jegou et al., TPAMI 2011) is the remaining canonical FAISS index
family next to the repo's SQ8 / IVF-SQ8 / binary-sign tiers: split the
64-dim vector into m=8 subspaces of 8 dims, learn k=16 centroids per
subspace, store each vector as 8 4-bit codes (4 bytes vs 256 — 64x).
Like the IVF coarse quantizer, the codebooks are an OFFLINE artifact:
trained once on a sample, versioned next to the code, and read by both
the registered query and its DuckDB oracle (read_parquet on the same
file), which is what makes the PQ pipeline fully cross-engine oracled.

Training is deterministic numpy Lloyd's per subspace — init = the
subvectors of the 16 lowest vec_ids, 5 iterations, empty cells keep
their previous centroid. Rerun only if the embeddings fixtures change:

    python tools/gen_pq_fixture.py
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_PARQUET = "/root/testdata/sf0.01/embeddings.parquet"
M, K, SUBDIM, ITERS = 8, 16, 8, 5


def train_subspace(X: np.ndarray) -> np.ndarray:
    """Deterministic Lloyd's: init = first K rows (vec_id order)."""
    cents = X[:K].copy()
    for _ in range(ITERS):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties -> lowest cid (argmin is first-min)
        for c in range(K):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def main() -> None:
    t = pq.read_table(TRAIN_PARQUET)
    order = np.argsort(np.asarray(t.column("vec_id").to_pylist()))
    X = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)[order]
    rows = []
    for s in range(M):
        sub = X[:, s * SUBDIM : (s + 1) * SUBDIM]
        cents = train_subspace(sub)
        for c in range(K):
            rows.append((s, c, [float(x) for x in cents[c]]))
    table = pa.table(
        {
            "subspace": pa.array([r[0] for r in rows], pa.int32()),
            "cid": pa.array([r[1] for r in rows], pa.int32()),
            "centroid": pa.array([r[2] for r in rows], pa.list_(pa.float64())),
        }
    )
    out = os.path.join(REPO, "fixtures", "pq_codebooks_m8_k16.parquet")
    pq.write_table(table, out)
    print(f"{out}: m={M} k={K} subdim={SUBDIM} iters={ITERS}")


if __name__ == "__main__":
    main()
