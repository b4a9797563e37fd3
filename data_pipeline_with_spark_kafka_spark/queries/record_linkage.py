"""Fuzzy record-linkage query (operator: operators/linkage.py).

The dirty side is derived deterministically from part itself — every
7th part's name loses its first character — so both engines build the
identical fixture. The blocking key is the name's last 6 characters,
which survives head-of-string corruption; edit distance is evaluated
only inside blocks.
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
), cand AS (
  SELECT d.d_key, d.dirty_name, c.p_partkey,
         levenshtein(d.dirty_name, c.p_name) AS lev
  FROM dirty d JOIN part c ON right(c.p_name, 6) = right(d.dirty_name, 6)
  WHERE levenshtein(d.dirty_name, c.p_name) <= 2
)
SELECT d_key, dirty_name, p_partkey AS matched_p_partkey, lev
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY d_key
                                   ORDER BY lev, p_partkey) AS rn
      FROM cand)
WHERE rn = 1
"""


@register("linkage_fuzzy_part_names", oracle=LINKAGE_FUZZY_ORACLE, tags=("linkage", "join"))
def linkage_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution of corrupted part names against the clean part
    catalog: suffix-blocked candidate join, bounded levenshtein(·,·,2),
    best match per dirty record. No cross join at any scale."""
    part = load_table(spark, sf_dir, "part")
    dirty = part.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey", F.expr("substr(p_name, 2)").alias("dirty_name")
    )
    return blocked_fuzzy_match(
        dirty,
        part,
        dirty_id="p_partkey",
        dirty_text="dirty_name",
        clean_id="p_partkey",
        clean_text="p_name",
        dirty_block=F.expr("right(dirty_name, 6)"),
        clean_block=F.expr("right(p_name, 6)"),
        max_dist=2,
    )
