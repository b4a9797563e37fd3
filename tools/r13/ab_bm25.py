"""Interleaved A/B of the r13 BM25 workload restriction (literal isin
filter + persisted postings) vs the r12 semi-join form, for
llm_bm25_topk and llm_hybrid_rrf.

    python tools/r13/ab_bm25.py [rounds]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    from pyspark.sql import functions as F

    from data_pipeline_with_spark_kafka_spark.operators import retrieval
    from data_pipeline_with_spark_kafka_spark.queries.llm_retrieval import (
        _WORKLOAD_TERMS,
        _qterms_df,
    )
    from data_pipeline_with_spark_kafka_spark.session import get_spark
    from data_pipeline_with_spark_kafka_spark.sources.tables import load_table_fanned
    from tools.ab_bench import ab

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-bm25")

    def bm25(filter_form: bool):
        docs = load_table_fanned(spark, sf_dir, "documents")
        return retrieval.bm25_topk(
            docs, _qterms_df(spark), "doc_id", "text", k=5,
            workload_terms=_WORKLOAD_TERMS if filter_form else None,
        )

    print(f"== llm_bm25_topk (load {os.getloadavg()[0]:.2f}) ==", flush=True)
    ab(spark, {"isin_filter": lambda: bm25(True), "semi_join_r12": lambda: bm25(False)}, rounds=rounds)

    def hybrid(filter_form: bool):
        from data_pipeline_with_spark_kafka_spark.queries import all_queries

        if filter_form:
            return all_queries()["llm_hybrid_rrf"].builder(spark, sf_dir)
        # r12 form: rebuild with the semi-join restriction
        import data_pipeline_with_spark_kafka_spark.queries.llm_retrieval as lr

        docs = load_table_fanned(spark, sf_dir, "documents")
        emb = load_table_fanned(spark, sf_dir, "embeddings")
        bmtop = retrieval.bm25_topk(docs, _qterms_df(spark), "doc_id", "text", k=5).select(
            "query_id", "doc_id", F.col("rank").alias("rb")
        )
        anchors = emb.filter(F.col("vec_id") < 4)
        # reuse the committed dense/rrf tail by monkey-patching is too
        # invasive; time only the bm25 sub-branch difference above.
        return bmtop

    print(f"== hybrid bm25 branch only (load {os.getloadavg()[0]:.2f}) ==", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
