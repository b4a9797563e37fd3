"""Flagship query: the reference pipeline's semantics, batch-shaped.

Re-expresses the core of the reference consumer
(``/root/reference/airflow_home/scripts/spark_consumer_kafka.py:55-128``)
over the ``events`` fixture:

- JSON payload parse (``from_json``/``get_json_object``  <- ref :66),
- conjunctive null-filter                                 (<- ref :74),
- event-time 1-minute tumbling window group-by            (<- ref :79-82),
- multi-aggregate with aliases (sum/avg/max/count)        (<- ref :83-89),
- window-bound extraction                                 (<- ref :90-99),
- stream-static equi-join with a small broadcast dim      (<- ref :101-106),
- derived scaled per-million metric, rounded to 4 dp      (<- ref :109-126).
  (Emitted as DOUBLE, not DECIMAL: Spark's decimal string form '0.0500'
  differs from DuckDB/pandas '0.05' under the driver's hash canon even
  though values are equal — see queries/functions_corpus.py cast family
  for where decimal CAST semantics are still exercised.)

Scale notes: the dim join is an explicit ``F.broadcast`` (no shuffle of the
fact side); the window aggregation is a single hash aggregate keyed on
(minute, nation_key) — partial aggregation map-side, one shuffle total.
Doubles that leave the query are rounded so results hash stably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table
from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to

FLAGSHIP_ORACLE = """
WITH parsed AS (
    SELECT CAST(ts AS TIMESTAMP) AS ts,
           CAST(user_id % 25 AS INTEGER) AS nation_key,
           value,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS props_k
    FROM events
    WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
), agg AS (
    SELECT date_trunc('minute', ts) AS window_start,
           nation_key,
           SUM(value) AS total_value,
           AVG(value) AS avg_value,
           MAX(value) AS max_value,
           COUNT(*) AS n_events,
           CAST(SUM(props_k) AS BIGINT) AS sum_k
    FROM parsed
    GROUP BY 1, 2
)
SELECT agg.window_start,
       agg.window_start + INTERVAL 1 MINUTE AS window_end,
       n.n_name AS nation_name,
       n.n_regionkey AS region_key,
       ROUND(agg.total_value, 4) AS total_value,
       ROUND(agg.avg_value, 4) AS avg_value,
       ROUND(agg.max_value, 4) AS max_value,
       agg.n_events,
       agg.sum_k,
       ROUND(agg.total_value * 1000000.0 / (100000.0 * (n.n_regionkey + 1)),
             4) AS value_per_million
FROM agg
JOIN nation n ON agg.nation_key = n.n_nationkey
"""


@register("flagship_events_windowed_enrichment", oracle=FLAGSHIP_ORACLE, tags=("flagship", "streaming-shaped"))
def flagship_events_windowed_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-min tumbling-window aggregation over events, enriched via a broadcast
    dim join, with a derived per-million DECIMAL metric."""
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")

    parsed = (
        events.withColumn("props_k", F.get_json_object("props", "$.k").cast("int"))
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .withColumn("nation_key", (F.col("user_id") % 25).cast("int"))
    )

    agg = (
        parsed.groupBy(F.window("ts", "1 minute").alias("w"), "nation_key")
        .agg(
            F.sum("value").alias("total_value"),
            F.avg("value").alias("avg_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("props_k").alias("sum_k"),
        )
    )

    return (
        agg.join(F.broadcast(nation), agg["nation_key"] == nation["n_nationkey"], "inner")
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("n_name").alias("nation_name"),
            F.col("n_regionkey").alias("region_key"),
            round_to("total_value", 4).alias("total_value"),
            round_to("avg_value", 4).alias("avg_value"),
            round_to("max_value", 4).alias("max_value"),
            F.col("n_events"),
            F.col("sum_k"),
            round_to(
                F.col("total_value") * F.lit(1000000.0) / (F.lit(100000.0) * (F.col("n_regionkey") + 1)),
                4,
            ).alias("value_per_million"),
        )
    )
