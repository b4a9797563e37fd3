"""Full-text retrieval queries: distributed inverted-index build and
BM25 top-k ranking for a literal probe workload (operators/retrieval).

Both queries are fully DuckDB-oracled — the oracle mirrors the index
build (explode + group), the document-frequency restriction, the exact
Lucene-variant idf arithmetic, and the rank tie-break, so candidate
generation AND scoring are cross-engine verified, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_with_spark_kafka_spark.operators import retrieval
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

# The probe workload: a handful of literal queries over the corpus
# vocabulary. Tiny by construction — the workload side of BM25 is always
# catalog-sized; the corpus side is the 100-TB relation.
PROBE_QUERIES: list[tuple[int, str]] = [
    (0, "spark shuffle join"),  # 'shuffle' is absent from the driver corpus
    (1, "stream window merge"),  # — BM25 must ignore unknown terms, not err
    (2, "fast query filter"),
    (3, "sort scan table"),
]

_QT_VALUES = ", ".join(
    f"({qid}, '{term}')" for qid, text in PROBE_QUERIES for term in text.split()
)

BM25_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), post AS (
    SELECT doc_id, len(t) AS dl, u.term, COUNT(*) AS tf
    FROM toks, UNNEST(t) AS u(term)
    GROUP BY 1, 2, 3
), stats AS (
    SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks
), qt AS (
    SELECT * FROM (VALUES {_QT_VALUES}) AS q(query_id, term)
), dfreq AS (
    SELECT term, COUNT(*) AS df_t FROM post
    WHERE term IN (SELECT DISTINCT term FROM qt)
    GROUP BY 1
), scored AS (
    SELECT qt.query_id, post.doc_id,
           SUM(
               LN(1 + (stats.n_docs - dfreq.df_t + 0.5) / (dfreq.df_t + 0.5))
               * post.tf * (1.2 + 1.0)
               / (post.tf + 1.2 * (1.0 - 0.75 + 0.75 * post.dl / stats.avgdl))
           ) AS s
    FROM qt
    JOIN post USING (term)
    JOIN dfreq USING (term)
    CROSS JOIN stats
    GROUP BY 1, 2
), ranked AS (
    SELECT query_id, doc_id, s,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY ROUND(s, 6) DESC, doc_id
           ) AS rank
    FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, ROUND(s, 4) AS score_bm25
FROM ranked WHERE rank <= 5
"""


@register("llm_bm25_topk", oracle=BM25_ORACLE, tags=("llm", "retrieval"))
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 documents per probe query (k1=1.2, b=0.75, Lucene
    positive idf). One postings shuffle; the probe workload is a literal
    12-term relation semi-joined in before any per-term statistics, so
    scoring never touches terms the workload doesn't ask about. Per-query
    top-k compiles to WindowGroupLimit partial top-k."""
    docs = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(
        [(qid, term) for qid, text in PROBE_QUERIES for term in text.split()],
        "query_id int, term string",
    )
    return retrieval.bm25_topk(docs, qterms, "doc_id", "text", k=5)


INVERTED_INDEX_ORACLE = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), post AS (
    SELECT doc_id, u.term, COUNT(*) AS tf
    FROM toks, UNNEST(t) AS u(term)
    GROUP BY 1, 2
), summary AS (
    SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM post GROUP BY 1
), numbered AS (
    SELECT term, doc_id,
           ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
    FROM post
), head AS (
    SELECT term,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings_head
    FROM numbered WHERE rn <= 16 GROUP BY term
), ranked AS (
    SELECT s.term, s.df, s.total_tf, head.postings_head,
           ROW_NUMBER() OVER (ORDER BY s.df DESC, s.term) AS rk
    FROM summary s JOIN head USING (term)
)
SELECT term, df, total_tf, postings_head FROM ranked WHERE rk <= 50
"""


@register("llm_inverted_index", oracle=INVERTED_INDEX_ORACLE, tags=("llm", "retrieval"))
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term inverted-index summary (document frequency, total term
    frequency, first-16 postings as CSV), capped at the 50 most frequent
    terms (df desc, term asc) so the output stays catalog-sized at any
    corpus scale. The full (doc, term, tf) relation is the 100-TB
    artifact; this is the collectable summary view."""
    docs = load_table(spark, sf_dir, "documents")
    idx = retrieval.inverted_index(docs, "doc_id", "text", postings_head=16)
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        idx.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .select("term", "df", "total_tf", "postings_head")
    )
