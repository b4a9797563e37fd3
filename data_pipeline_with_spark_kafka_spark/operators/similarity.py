"""Similarity search over embedding columns (``array<float>``).

Two tiers:
- **Brute-force cosine top-k** — exact; dot products via
  ``zip_with``/``aggregate`` (JVM codegen, no Python), global top-k via
  orderBy+limit (TakeOrderedAndProject: per-partition heap, no full sort).
  At 100 TB this is the per-partition scan baseline every ANN variant is
  recall-tested against.
- **Random-hyperplane LSH ANN** — deterministic signed projections
  (seeded NumPy planes shipped as a broadcast literal), bucket on the sign
  bits, search only the query's bucket (optionally multi-probe neighbors).
  Candidate set shrinks ~2^n_planes-fold; recall is tested, not assumed.

An IVF variant would swap the hash bucket for a nearest-centroid
assignment (k-means trained offline); the probe/bucket plumbing here is
identical, so only the bucket expression changes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to


def as_double(vec_col: Column) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    *,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of every row against a single-row query relation
    (broadcast — the fact side never shuffles)."""
    # limit(1) makes the 1-row contract structural (GlobalLimit in the
    # plan), so the broadcast hint is provably bounded regardless of scale.
    q = query_df.select(as_double(F.col(vec_col)).alias("qvec")).limit(1)
    v = as_double(F.col(vec_col))
    return (
        df.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            round_to(cosine(v, F.col("qvec")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_signs(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket id = integer of sign bits of <plane_i, v>.

    Each plane is ONE array Literal (``F.lit(ndarray)`` — a Python list
    would desugar to CreateArray of dim element literals): at dim 512 x 8
    planes the per-element form put 4096 expression nodes into the tree,
    bloating analysis and codegen; a Literal is a single node regardless
    of dim."""
    acc = F.lit(0).cast("long")
    for plane in planes:
        plane_lit = F.lit(np.asarray(plane, dtype=np.float64))
        bit = F.when(dot(as_double(vec_col), plane_lit) >= 0, 1).otherwise(0)
        acc = acc * 2 + bit
    return acc


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic Rademacher(+-1) hyperplanes."""
    rng = np.random.RandomState(seed)
    return rng.choice([-1.0, 1.0], size=(n_planes, dim))


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    *,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: exact rerank restricted to buckets within
    ``probe_radius`` sign-bit flips of the query's bucket (multi-probe LSH —
    recall/candidate tradeoff is the probe radius, not a rebuild)."""
    planes = make_planes(dim, n_planes, seed)
    bucketed = df.withColumn("bucket", hyperplane_signs(F.col(vec_col), planes))
    q = query_df.select(
        as_double(F.col(vec_col)).alias("qvec"),
        hyperplane_signs(F.col(vec_col), planes).alias("qbucket"),
    ).limit(1)  # structural 1-row bound -> broadcast hint is scale-safe
    v = as_double(F.col(vec_col))
    probe = F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket"))) <= probe_radius
    return (
        bucketed.join(F.broadcast(q), probe)
        .select(F.col(id_col), round_to(cosine(v, F.col("qvec")), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
