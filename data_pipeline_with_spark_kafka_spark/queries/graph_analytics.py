"""Graph analytics with an exact oracle: triangle counting and the
global clustering coefficient over the co-purchase graph.

Complements the 🧪-only iterative operators (PageRank in
operators/graph.py, connected components in operators/dedup.py) with a
non-iterative graph measure the DuckDB oracle can verify exactly.

Scale notes: the edge list is derived by the same bounded per-order
pair expansion as `affinity_part_pairs` (≤C(lines-per-order, 2) pairs
per order; round 8: one collect_set shuffle + expression-side pair
explode via `operators/graph.co_occurrence_pairs`, replacing the old
three-shuffle self-join), then thresholded on co-occurrence support —
the graph is catalog-sized, not fact-sized. Triangles enumerate via the canonical a<b<c ordered
two-hop join (each triangle counted exactly once, no permutation
dedup); wedges come from the degree relation. The edge relation is
persisted: it feeds three self-join arms plus the degree and count
branches, and is tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

MIN_SUPPORT = 2

TRIANGLE_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY pa, pb HAVING COUNT(*) >= {MIN_SUPPORT}
), tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.pa = e1.pb
  JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
), deg AS (
  SELECT v, COUNT(*) AS d
  FROM (SELECT pa AS v FROM edges UNION ALL SELECT pb AS v FROM edges)
  GROUP BY v
), wedge AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
), ecnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges
)
SELECT w.n_nodes, e.n_edges, t.n_triangles,
       ROUND(CASE WHEN w.n_wedges > 0
                  THEN 3.0 * t.n_triangles / w.n_wedges ELSE 0.0 END, 6)
         AS global_clustering
FROM tri t, wedge w, ecnt e
"""


@register("graph_triangle_count", oracle=TRIANGLE_ORACLE, tags=("graph", "analytics"))
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient
    (3·triangles / wedges) of the co-purchase part graph (edges =
    pairs co-ordered in >= 2 orders). Canonical a<b<c enumeration —
    one ordered two-hop join, each triangle counted once."""
    from data_pipeline_with_spark_kafka_spark.operators.graph import (
        co_occurrence_pairs,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    # Pair derivation (round-8 rewrite): co_occurrence_pairs collapses the
    # old distinct + orderkey self-join + pair-agg (three shuffles of the
    # pairs relation) into ONE collect_set aggregate + expression-side
    # pair explode; the array is bounded by lines-per-order, never the
    # catalog.
    edges = (
        co_occurrence_pairs(lineitem, "l_orderkey", "l_partkey")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_SUPPORT)
        .select("pa", "pb")
        .persist()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("pa").alias("v"))
        .unionByName(edges.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedge = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1) / 2)).cast("long").alias("n_wedges"),
    )
    ecnt = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(wedge)
        .crossJoin(ecnt)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            round_to(
                F.when(
                    F.col("n_wedges") > 0,
                    3.0 * F.col("n_triangles") / F.col("n_wedges"),
                ).otherwise(0.0),
                6,
            ).alias("global_clustering"),
        )
    )
