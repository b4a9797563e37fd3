"""Fuzzy record-linkage query (operator: operators/linkage.py).

The dirty side is derived deterministically from part itself — every
7th part's name loses its first character — so both engines build the
identical fixture. The blocking key is the name's last 6 characters,
which survives head-of-string corruption; edit distance is evaluated
only inside blocks.

The fixture's name column is heavily duplicated (64 distinct values
across 20k rows at sf0.1), so the query matches on the DISTINCT-name
relations and broadcasts the name-level decisions back to rows — the
same dedupe-the-match-space move ``operators/bpe.py`` uses for words.
Edit distance then runs on |distinct dirty| x |block mates| pairs
instead of row x row; with mostly-unique names the distinct relation
degenerates to the row relation and nothing is lost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.linkage import blocked_fuzzy_match
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

LINKAGE_FUZZY_ORACLE = """
WITH dirty AS (
  SELECT p_partkey AS d_key, substr(p_name, 2) AS dirty_name
  FROM part WHERE p_partkey % 7 = 0
), dn AS (
  SELECT DISTINCT dirty_name FROM dirty
), cn AS (
  SELECT p_name, MIN(p_partkey) AS min_key FROM part GROUP BY p_name
), cand AS (
  SELECT d.dirty_name, c.p_name, c.min_key,
         levenshtein(d.dirty_name, c.p_name) AS lev
  FROM dn d JOIN cn c ON right(c.p_name, 6) = right(d.dirty_name, 6)
  WHERE levenshtein(d.dirty_name, c.p_name) <= 2
), best AS (
  SELECT dirty_name, min_key, lev
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_name
                                     ORDER BY lev, p_name) AS rn
        FROM cand)
  WHERE rn = 1
)
SELECT d.d_key, d.dirty_name, b.min_key AS matched_p_partkey, b.lev
FROM dirty d JOIN best b USING (dirty_name)
"""


@register("linkage_fuzzy_part_names", oracle=LINKAGE_FUZZY_ORACLE, tags=("linkage", "join"))
def linkage_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution of corrupted part names against the clean part
    catalog: distinct-name match space, suffix-blocked candidate join,
    bounded levenshtein(·,·,2), best name per dirty name (tie-break:
    lev, then clean name, then min catalog key), decisions joined back
    to the dirty rows (AQE broadcast-elects the decision side when the
    distinct-name relation is actually small — with mostly-unique names
    it is sf-proportional, so no hard hint). No cross join at any
    scale."""
    part = load_table(spark, sf_dir, "part")
    dirty = part.filter(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("d_key"), F.expr("substr(p_name, 2)").alias("dirty_name")
    )
    dn = dirty.select("dirty_name").distinct()
    cn = part.groupBy("p_name").agg(F.min("p_partkey").alias("min_key"))
    best = blocked_fuzzy_match(
        dn,
        cn,
        dirty_id="dirty_name",
        dirty_text="dirty_name",
        clean_id="p_name",
        clean_text="p_name",
        dirty_block=F.expr("right(dirty_name, 6)"),
        clean_block=F.expr("right(p_name, 6)"),
        max_dist=2,
    ).select(
        F.col("d_key").alias("dirty_name"),  # operator's dirty_id alias
        F.col("matched_p_name"),
        "lev",
    )
    best_keyed = best.join(
        cn.select(F.col("p_name").alias("matched_p_name"), "min_key"), "matched_p_name"
    ).select("dirty_name", F.col("min_key").alias("matched_p_partkey"), "lev")
    return dirty.join(best_keyed, "dirty_name").select(
        "d_key", "dirty_name", "matched_p_partkey", "lev"
    )
