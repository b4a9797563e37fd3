from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to

__all__ = ["round_to"]
