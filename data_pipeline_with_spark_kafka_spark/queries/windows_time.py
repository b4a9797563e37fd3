"""Time-window queries beyond the flagship's tumbling window: sliding and
session windows (SURVEY.md §2.8 [EXT]), expressed in batch mode where the
DuckDB oracle can check them; the same expressions run unchanged on a
stream (see streaming/covid_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

SLIDING_ORACLE = """
WITH e AS (
    -- ts IS NOT NULL: rows without event time cannot be windowed —
    -- Spark's window()/session_window silently exclude them; the
    -- oracle must too (round-8 all-NULL edge corpus).
    SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
    WHERE ts IS NOT NULL
), expanded AS (
    SELECT ts, event_type, value,
           UNNEST([CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)) AS TIMESTAMP),
                   CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT)) AS TIMESTAMP)]) AS window_start
    FROM e
)
SELECT window_start,
       window_start + INTERVAL 10 MINUTE AS window_end,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM expanded
GROUP BY window_start, event_type
"""


@register("window_sliding_10m_5m", oracle=SLIDING_ORACLE, tags=("window", "time"))
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min size / 5 min slide): each event lands in two
    windows (Spark expands via Expand — oracle mirrors with UNNEST of the
    two aligned starts)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_to(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


SESSION_ORACLE = """
WITH e AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    WHERE ts IS NOT NULL  -- see the sliding oracle's note
), flagged AS (
    SELECT user_id, ts, value,
           -- STRICT > : Spark's session_window treats window end as
           -- INCLUSIVE for merging — an event landing exactly at
           -- prev_ts + gap still joins the session (caught by the
           -- round-9 day_boundary edge corpus; organic data never hit
           -- an exactly-30-min gap)
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM e
), numbered AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM numbered
GROUP BY user_id, session_id
"""


@register("window_session_30m", oracle=SESSION_ORACLE, tags=("window", "time"))
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-min gap) per user. Spark merges event windows
    [t, t+gap] that touch — an event exactly at a window's end still
    joins it — so the oracle's islands construction splits on gap
    STRICTLY > 30 min (the >= form diverged on an exactly-30-min gap,
    caught by the round-9 day_boundary edge corpus)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_to(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
