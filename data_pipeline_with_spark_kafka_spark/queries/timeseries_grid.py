"""Time-series gap-fill query (operator: operators/timeseries.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.timeseries import resample_linear
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

TS_GAP_FILL_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE user_id % 20 = 0
), hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket, AVG(value) AS v
  FROM ev GROUP BY 1, 2
), bounds AS (
  SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM hourly GROUP BY 1
), spine AS (
  SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
), filled AS (
  SELECT s.user_id, s.bucket, h.v
  FROM spine s LEFT JOIN hourly h USING (user_id, bucket)
), nav AS (
  SELECT user_id, bucket, v,
    LAST_VALUE(v IGNORE NULLS) OVER wb AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wb AS ph,
    FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf AS nh
  FROM filled
  WINDOW wb AS (PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket, v IS NULL AS was_gap,
       ROUND(CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * (epoch(bucket) - epoch(ph))
                                      / (epoch(nh) - epoch(ph)) END, 4)
       AS value_filled
FROM nav
"""


@register("ts_gap_fill_interpolate", oracle=TS_GAP_FILL_ORACLE, tags=("timeseries", "window"))
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly regularization of per-user event values: average within
    the hour, dense hour grid per user between first and last
    observation, linear interpolation across gaps (nearest-carry at the
    edges). One corpus shuffle + per-key windows."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    return resample_linear(events, "user_id", "ts", "value", step="1 hour")
