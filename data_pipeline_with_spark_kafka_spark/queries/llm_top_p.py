"""Top-p (nucleus) corpus selection per domain.

Budgeted curation: from each source, keep the smallest set of
highest-value documents whose combined mass reaches a fraction p of
the domain's total — the document-selection analogue of nucleus
sampling. Mass here is ``n_chars`` (deterministic and present in the
fixture); swapping in a model quality score changes nothing
structurally.

Scale notes: one shuffle — both the domain total and the running
prefix sum are windows over the same ``source`` partitioning, so they
share a single Exchange; ties are broken by doc_id for a deterministic
cut on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

TOP_P = 0.9

TOP_P_ORACLE = f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         SUM(n_chars) OVER (PARTITION BY source) AS tot,
         SUM(n_chars) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS run
  FROM documents
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM s WHERE run - n_chars < {TOP_P} * tot
"""


@register("llm_top_p_selection", oracle=TOP_P_ORACLE, tags=("llm", "sampling"))
def llm_top_p_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each source's largest documents until 90% of the source's
    character mass is covered (smallest covering prefix: a document is
    kept iff the mass BEFORE it is still under the budget)."""
    docs = load_table(spark, sf_dir, "documents")
    by_source = Window.partitionBy("source")
    running = by_source.orderBy(F.desc("n_chars"), "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.sum("n_chars").over(by_source).alias("tot"),
        F.sum("n_chars").over(running).alias("run"),
    )
    return s.filter(F.col("run") - F.col("n_chars") < TOP_P * F.col("tot")).select(
        "doc_id", "source", "n_chars"
    )
