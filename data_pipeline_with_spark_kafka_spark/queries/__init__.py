"""Query corpus: importing this package registers every named query."""

from data_pipeline_with_spark_kafka_spark.queries import (  # noqa: F401
    data_quality,
    emb_analytics,
    emb_pca,
    events_analytics,
    flagship,
    functions_corpus,
    governance,
    graph_analytics,
    ivm_rollup,
    llm,
    llm_classifier,
    llm_curation,
    llm_fast_paths,
    llm_repetition,
    llm_sampling,
    llm_scoring,
    llm_top_p,
    nulls_semantics,
    record_linkage,
    relational,
    scd_dimension,
    setops_extra,
    sql_surface,
    stats_extra,
    text_extra,
    timeseries_grid,
    tpch,
    tpch_extra,
    tpch_final,
    tpch_multijoin,
    tpch_subqueries,
    windows_time,
)
from data_pipeline_with_spark_kafka_spark.queries.registry import Query, all_queries, register

__all__ = ["Query", "all_queries", "register"]
