from data_pipeline_with_spark_kafka_spark.orchestration.jobs import (
    JobResult,
    JobSpec,
    RetryPolicy,
    SparkSubmitSpec,
    airflow_dag_source,
    run_dag,
    topological_order,
)

__all__ = [
    "JobResult",
    "JobSpec",
    "RetryPolicy",
    "SparkSubmitSpec",
    "airflow_dag_source",
    "run_dag",
    "topological_order",
]
