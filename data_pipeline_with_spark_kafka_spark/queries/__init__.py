"""Query corpus: importing this package registers every named query."""

from data_pipeline_with_spark_kafka_spark.queries import flagship, tpch  # noqa: F401
from data_pipeline_with_spark_kafka_spark.queries.registry import Query, all_queries, register

__all__ = ["Query", "all_queries", "register"]
