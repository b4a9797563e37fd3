"""Maximal Marginal Relevance (MMR) diversified selection.

Public method (Carbonell & Goldstein, SIGIR 1998): greedily build a
result set that balances relevance to the query against redundancy with
what's already selected —

    next = argmax_c  lam * sim(q, c) - (1 - lam) * max_{s in S} sim(c, s)

Used in training-data pipelines to pick diverse exemplars / eval seeds /
demo sets out of a near-duplicate-heavy retrieval pool.

Spark-first shape: the DISTRIBUTED work is the relevance pool — an exact
cosine top-``pool`` scan (TakeOrderedAndProject, corpus never shuffles) —
and the greedy runs per query group inside ONE ``applyInPandas`` call
over the bounded pool (k * pool * dim vectorized flops; pool is a
GlobalLimit, so the group is structurally tiny no matter the corpus).
With a query SET the groups fan out across executors — the same per-group
kernel shape as the per-cell BLAS dedup tiers.

Cross-engine determinism: relevance comes in ALREADY rounded by the Spark
expression layer; pairwise sims are rounded half-away-from-zero at 1e-6
inside the kernel (matching Spark/DuckDB ROUND semantics — np.round is
banker's and would diverge on exact ties); every comparison then runs on
bit-identical doubles in both engines, and ties break on vec_id. The
DuckDB oracle replays the greedy as an UNROLLED chain of step CTEs
(selection is k steps, k is a literal — loop unrolling is the standard
SQL encoding of a bounded iteration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.operators import similarity as sim


def _round_half_away(x: np.ndarray, scale: int = 6) -> np.ndarray:
    """ROUND as Spark/DuckDB do it (half away from zero) — np.round is
    banker's rounding and differs on exact .5 ties."""
    f = 10.0**scale
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def _greedy_mmr(pdf: pd.DataFrame, *, k: int, lam: float) -> pd.DataFrame:
    """Per-group MMR kernel over a bounded candidate pool."""
    ids = pdf["vec_id"].to_numpy()
    rel = pdf["rel"].to_numpy(dtype=np.float64)
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    sims = _round_half_away((vecs @ vecs.T) / np.outer(norms, norms))

    order = np.lexsort((ids,))  # stable id ordering for tie-breaks
    ids, rel, sims = ids[order], rel[order], sims[np.ix_(order, order)]

    selected: list[int] = []
    out = []
    remaining = list(range(len(ids)))
    for pos in range(1, min(k, len(ids)) + 1):
        best_i, best_score = None, None
        for i in remaining:
            max_sim = max((sims[i, j] for j in selected), default=0.0)
            score = lam * rel[i] - (1.0 - lam) * max_sim
            # strict > keeps the lowest vec_id on ties (remaining is
            # id-ordered after the lexsort above)
            if best_score is None or score > best_score:
                best_i, best_score = i, score
        selected.append(best_i)
        remaining.remove(best_i)
        out.append(
            (
                int(ids[best_i]),
                pos,
                float(rel[best_i]),
                float(_round_half_away(np.float64(best_score))),
            )
        )
    return pd.DataFrame(out, columns=["vec_id", "position", "relevance", "mmr_score"])


def mmr_select(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    *,
    k: int = 8,
    pool: int = 30,
    lam: float = 0.7,
) -> DataFrame:
    """Diversified top-k: exact cosine top-``pool`` scan, then the greedy
    MMR kernel per query group (one bounded applyInPandas)."""
    # Norm hoist (similarity.cosine_pre contract): the cast runs once per
    # row (it was evaluated twice — as the pool's v column AND inside
    # cosine), the query norm once total instead of per row.
    q = (
        query_df.select(sim.as_double(F.col(vec_col)).alias("qv"))
        .limit(1)
        .withColumn("qn", sim.l2_norm(F.col("qv")))
    )
    fact = df.select(
        F.col(id_col).alias("vec_id"), sim.as_double(F.col(vec_col)).alias("v")
    ).withColumn("_n", sim.l2_norm(F.col("v")))
    pool_df = (
        fact.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "v",
            round_to(
                sim.cosine_pre(F.col("v"), F.col("_n"), F.col("qv"), F.col("qn")), 6
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(pool)
    )
    return (
        pool_df.groupBy(F.lit(0).alias("_g"))
        .applyInPandas(
            lambda pdf: _greedy_mmr(pdf, k=k, lam=lam),
            "vec_id long, position int, relevance double, mmr_score double",
        )
    )


def mmr_oracle_sql(*, k: int = 8, pool: int = 30, lam: float = 0.7) -> str:
    """Generate the unrolled-greedy DuckDB oracle for ``mmr_select`` over
    the embeddings fixture (query = vec_id 0).

    The greedy loop is unrolled into ``k`` step CTEs: step_i picks the
    argmax of ``lam*rel - (1-lam)*max(sim to sel_{i-1})`` over candidates
    not yet selected, ties on vec_id — exactly the kernel's comparison,
    on identically-rounded doubles."""
    one_minus = 1.0 - lam
    parts = [
        f"""WITH e AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
    SELECT v AS qv FROM e WHERE vec_id = 0
), pool AS MATERIALIZED (
    SELECT e.vec_id, e.v,
           ROUND(list_dot_product(e.v, q.qv)
                 / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))
                 * 1000000) / 1000000 AS rel
    FROM e, q
    ORDER BY rel DESC, e.vec_id
    LIMIT {pool}
), sims AS MATERIALIZED (
    SELECT a.vec_id AS ia, b.vec_id AS ib,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                 * 1000000) / 1000000 AS s
    FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
), step1 AS (
    SELECT vec_id, 1 AS position, rel AS relevance,
           ROUND(({lam} * rel - {one_minus} * 0.0) * 1000000) / 1000000 AS mmr_score
    FROM pool
    QUALIFY ROW_NUMBER() OVER (ORDER BY {lam} * rel - {one_minus} * 0.0 DESC, vec_id) = 1
), sel1 AS MATERIALIZED (
    SELECT vec_id, position, relevance, mmr_score FROM step1
)"""
    ]
    for i in range(2, k + 1):
        prev = f"sel{i - 1}"
        parts.append(
            f""", step{i} AS (
    SELECT p.vec_id, {i} AS position, p.rel AS relevance,
           ROUND(({lam} * p.rel - {one_minus} *
                  (SELECT MAX(s.s) FROM sims s JOIN {prev} t ON s.ib = t.vec_id
                   WHERE s.ia = p.vec_id)) * 1000000) / 1000000 AS mmr_score
    FROM pool p
    WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev})
    QUALIFY ROW_NUMBER() OVER (
        ORDER BY {lam} * p.rel - {one_minus} *
                 (SELECT MAX(s.s) FROM sims s JOIN {prev} t ON s.ib = t.vec_id
                  WHERE s.ia = p.vec_id) DESC, p.vec_id) = 1
), sel{i} AS MATERIALIZED (
    SELECT * FROM {prev} UNION ALL SELECT * FROM step{i}
)"""
        )
    parts.append(
        f"\nSELECT vec_id, CAST(position AS INT) AS position, relevance, mmr_score\n"
        f"FROM sel{k} ORDER BY position"
    )
    return "".join(parts)
