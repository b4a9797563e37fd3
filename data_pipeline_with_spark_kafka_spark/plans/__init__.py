from data_pipeline_with_spark_kafka_spark.plans.pipeline import (
    Pipeline,
    SinkSpec,
    SourceSpec,
)

__all__ = ["Pipeline", "SinkSpec", "SourceSpec"]
