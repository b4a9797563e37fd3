"""Linear (fasttext-style) quality-classifier scoring over documents.

The DCLM / fineweb-edu curation shape: a trained linear model assigns
each document P(keep) from a bag-of-tokens score and the pipeline
filters on it. Training happens offline; what the engine must do at
corpus scale is SCORING: tokens -> vocabulary weight lookup -> per-doc
mean weight -> sigmoid -> threshold.

Weights here are a deterministic function of the token text (so both
engines derive the identical "model" without shipping an artifact);
swapping in real learned weights changes nothing structurally.

Scale notes (100 TB design):
- the vocabulary is frequency-top-k over the corpus (vocabulary-sized
  relation, limit-bounded) and is explicitly broadcast — the token
  stream never shuffles for the lookup;
- the only corpus-sized shuffle is the per-doc aggregation, which
  combines map-side (sum/count per doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

VOCAB_K = 500
BIAS = 0.1

QUALITY_CLASSIFIER_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
), vocab AS (
  SELECT token,
         ((ascii(token) * 7 + length(token) * 13) % 41 - 20) / 20.0 AS w
  FROM (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        ORDER BY cnt DESC, token LIMIT {VOCAB_K})
), scored AS (
  SELECT t.doc_id, SUM(COALESCE(v.w, 0.0)) AS sw, COUNT(*) AS n_tokens
  FROM tok t LEFT JOIN vocab v USING (token)
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(1.0 / (1.0 + exp(-(sw / n_tokens - {BIAS}))), 6) AS quality_prob,
       1.0 / (1.0 + exp(-(sw / n_tokens - {BIAS}))) > 0.5 AS keep
FROM scored
"""


def _weight(token: Column) -> Column:
    """Deterministic stand-in for a learned token weight in [-1, 1]."""
    return ((F.ascii(token) * 7 + F.length(token) * 13) % 41 - 20) / 20.0


@register("llm_quality_classifier", oracle=QUALITY_CLASSIFIER_ORACLE, tags=("llm", "quality"))
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with a linear bag-of-tokens model: mean
    vocabulary weight -> sigmoid -> keep/drop. Vocabulary = corpus
    top-500 tokens (limit-bounded, broadcast); one per-doc shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(VOCAB_K)
        .select("token", _weight(F.col("token")).alias("w"))
    )
    scored = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("w"), F.lit(0.0))).alias("sw"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    prob = 1.0 / (1.0 + F.exp(-(F.col("sw") / F.col("n_tokens") - BIAS)))
    return scored.select(
        "doc_id",
        "n_tokens",
        round_to(prob, 6).alias("quality_prob"),
        (prob > 0.5).alias("keep"),
    )
