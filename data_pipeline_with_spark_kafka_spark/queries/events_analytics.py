"""Event-analytics corpus over the ``events`` stream table: funnels, daily
actives, retention cohorts — the product-analytics queries a streaming ETL
feeds (all batch-mode here with DuckDB oracles; the same expressions run on
the streaming surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

FUNNEL_ORACLE = """
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
           MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
    FROM events
    GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
       CAST(SUM(CASE WHEN first_signup IS NOT NULL AND first_purchase > first_signup
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM firsts
"""


@register("events_funnel_conversion", oracle=FUNNEL_ORACLE, tags=("events", "analytics"))
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> purchase funnel: conditional MIN timestamps per user, then
    ordered-step conversion counts (one shuffle on user_id)."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("first_signup").isNotNull(), 1).otherwise(0)).alias("n_signed_up"),
        F.sum(
            F.when(
                F.col("first_signup").isNotNull()
                & (F.col("first_purchase") > F.col("first_signup")),
                1,
            ).otherwise(0)
        ).alias("n_converted"),
    )


DAU_ORACLE = """
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       COUNT(DISTINCT user_id) AS dau,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY 1
"""


@register("events_daily_active_users", oracle=DAU_ORACLE, tags=("events", "analytics"))
def events_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + volume (count-distinct per calendar day)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
            round_to(F.sum("value"), 4).alias("total_value"),
        )
    )


RETENTION_ORACLE = """
WITH first_day AS (
    SELECT user_id, MIN(date_trunc('day', CAST(ts AS TIMESTAMP))) AS cohort_day
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS active_day
    FROM events
)
SELECT f.cohort_day,
       CAST(datediff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
       COUNT(*) AS n_active
FROM activity a
JOIN first_day f ON f.user_id = a.user_id
GROUP BY 1, 2
"""


@register("events_retention_cohorts", oracle=RETENTION_ORACLE, tags=("events", "analytics"))
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: first-seen day x day-offset activity counts
    (classic double aggregate + self-derived dim join)."""
    events = load_table(spark, sf_dir, "events")
    first_day = events.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    activity = events.select(
        "user_id", F.date_trunc("day", "ts").alias("active_day")
    ).distinct()
    return (
        activity.join(first_day, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


ZSCORE_ORACLE = """
WITH stats AS (
    SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
    FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - s.m) / s.sd, 4) AS z
FROM events e JOIN stats s ON s.event_type = e.event_type
WHERE ABS(ROUND((e.value - s.m) / s.sd, 4)) >= 2.5
"""


@register("events_zscore_outliers", oracle=ZSCORE_ORACLE, tags=("events", "quality", "agg"))
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| >= 2.5): the numeric anomaly filter
    a metrics/training-data pipeline runs before aggregation.

    Shape: the per-type stats relation is GROUP-COUNT-sized (5 rows) —
    groupBy + join back, NOT a window over the raw events (a per-type
    window would shuffle the full fact table into 5 hot partitions; the
    group-then-join form keeps the fact side narrow and the skew on the
    tiny side). No explicit broadcast hint: the stats side is an
    aggregate over the sf-proportional events scan, so the hint is left
    to AQE, which measures the post-agg size and elects the broadcast at
    runtime (the q22/q14 de-hinting discipline). Comparison happens on
    the ROUNDED z so both engines admit identical rows despite last-ulp
    aggregate differences. nullif(sd, 0): a CONSTANT value column has
    sd=0, which ANSI Spark turns into a DIVIDE_BY_ZERO crash while
    DuckDB's float x/0 yields NULL — z becomes NULL on both and the
    filter drops the rows (round-8 one-group edge corpus)."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    z = round_to(
        (F.col("value") - F.col("m")) / F.nullif(F.col("sd"), F.lit(0.0)), 4
    )
    return (
        events.join(stats, "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) >= 2.5)
    )


MAX_CONCURRENCY_ORACLE = """
WITH pts AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE, -1 FROM events
), run AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM pts
)
SELECT event_type, CAST(MAX(c) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_events
FROM run GROUP BY event_type
"""


@register("events_max_concurrency", oracle=MAX_CONCURRENCY_ORACLE, tags=("events", "window"))
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type via a sweep line: each event
    holds a 10-minute interval; explode to +1/-1 endpoints, running-sum
    per type ordered by (t, delta) — the half-open convention (ends
    release before simultaneous starts count) — then max.

    Scale notes: the sweep is ONE window shuffle over 2x the events
    (endpoints), map-side agg for the final max — no interval self-join
    (the naive overlap join is quadratic in the dense regions). Tie
    groups only permute identical increments, so the running max is
    deterministic without a per-row tiebreak."""
    events = load_table(spark, sf_dir, "events")
    pts = events.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
                F.struct(
                    (F.col("ts") + F.expr("interval 10 minutes")).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("p"),
    ).select("event_type", "p.t", "p.delta")
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("c", F.sum("delta").over(w))
        .groupBy("event_type")
        .agg(
            F.max("c").cast("long").alias("max_concurrent"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_events"),
        )
    )


SESSION_IDS_ORACLE = """
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
), gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), ids AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM gaps
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM ids GROUP BY user_id, session_seq
"""


@register("events_session_ids", oracle=SESSION_IDS_ORACLE, tags=("events", "window"))
def events_session_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit sessionization: a session starts at each >30-minute gap
    (lag + running sum of gap flags per user), then per-session stats.
    Unlike F.session_window this keeps row->session assignment
    addressable (the session_seq id), which downstream joins need.
    All three windows and the final aggregate share one user_id
    partitioning; the order key includes event_id so ties are stable."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    ids = events.select("user_id", "ts", "event_id").withColumn(
        "session_seq", F.sum(new_session).over(run)
    )
    return ids.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


ROLLING_DAU_ORACLE = """
WITH day_user AS (
  SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, user_id FROM events
), days AS (
  SELECT DISTINCT d FROM day_user
)
SELECT days.d AS day,
       CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS active_users_7d
FROM days JOIN day_user du
  ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY days.d
"""


@register("events_rolling_7d_active_users", oracle=ROLLING_DAU_ORACLE, tags=("events", "window"))
def events_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. Rolling DISTINCT
    cannot ride a window frame (per-day distinct sets overlap), so the
    scale shape is: dedup to (day, user) pairs FIRST — the only
    corpus-sized shuffle — then fan each pair out to the ≤7 days whose
    trailing window contains it (sequence explode, bounded x7) and
    count distinct per day. The fan-out relation is |days x users|-
    bounded, never raw events."""
    events = load_table(spark, sf_dir, "events")
    day_user = events.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    fanned = day_user.select(
        F.explode(
            F.expr("sequence(d, d + interval 6 days, interval 1 day)")
        ).alias("day"),
        "user_id",
    )
    days = day_user.select(F.col("d").alias("day")).distinct()
    return (
        fanned.join(days, "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
    )


ORDERED_FUNNEL_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
), s AS (
  SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_step1_signup,
       CAST(COUNT(c.t2) AS BIGINT) AS n_step2_click_after,
       CAST(COUNT(p.t3) AS BIGINT) AS n_step3_purchase_after
FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


@register("events_funnel_ordered_steps", oracle=ORDERED_FUNNEL_ORACLE, tags=("events", "analytics"))
def events_funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel (signup -> first click AFTER the
    signup -> first purchase AFTER that click). Unlike the 2-step
    conditional-min funnel, each step's anchor depends on the previous
    step's time, so the shape is chained per-user aggregates — all
    partitioned on user_id, so the three joins reuse one hash
    partitioning rather than reshuffling."""
    events = load_table(spark, sf_dir, "events")
    e = events.select("user_id", "event_type", "ts")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_step1_signup"),
            F.count("t2").alias("n_step2_click_after"),
            F.count("t3").alias("n_step3_purchase_after"),
        )
    )


# --------------------------------------------------------------------------
# Last-touch marketing attribution (round 7)
# --------------------------------------------------------------------------
#
# For every purchase, credit the user's most recent preceding touch event
# (view/click) within a 7-day lookback — the classic attribution model.
# The naive form is a per-purchase range join (purchases x touches); the
# scale form used here is ONE pass: sort each user's events once and
# carry the last touch forward with an ignore-nulls window, so the cost
# is a single shuffle on user_id regardless of touch density. Strictly
# "before" is defined on the (ts, event_id) total order, so same-
# timestamp ties are deterministic on both engines.

ATTRIBUTION_ORACLE = """
WITH carried AS (
    SELECT event_id, user_id, ts, event_type, value,
           LAST_VALUE(CASE WHEN event_type IN ('view', 'click') THEN ts END
                      IGNORE NULLS) OVER w AS touch_ts,
           LAST_VALUE(CASE WHEN event_type IN ('view', 'click') THEN event_type END
                      IGNORE NULLS) OVER w AS touch_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), attributed AS (
    SELECT CASE WHEN touch_ts IS NOT NULL
                     AND touch_ts >= ts - INTERVAL 7 DAY
                THEN touch_type ELSE 'unattributed' END AS touch_type,
           value, user_id
    FROM carried WHERE event_type = 'purchase'
)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(SUM(value), 4) AS attributed_value
FROM attributed GROUP BY touch_type
"""


@register(
    "events_attribution_last_touch",
    oracle=ATTRIBUTION_ORACLE,
    tags=("events", "analytics", "window"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: per purchase, the user's most recent
    preceding view/click within 7 days (else 'unattributed'), rolled up
    to per-touch-type purchase counts, reached users, and value.

    Scale shape: NOT a purchases-x-touches range join — one ignore-nulls
    last() window carries the latest touch along each user's (ts,
    event_id)-ordered event stream, so the fact table shuffles once on
    user_id and the frame never materializes more than the running
    carry. The rollup is a touch-type-sized aggregate."""
    events = load_table(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("view", "click")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = events.select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w).alias("touch_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    attributed = carried.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_ts").isNotNull()
            & (F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
            F.col("touch_type"),
        )
        .otherwise(F.lit("unattributed"))
        .alias("touch_type"),
        "value",
        "user_id",
    )
    return attributed.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        round_to(F.sum("value"), 4).alias("attributed_value"),
    )


# --------------------------------------------------------------------------
# Event-sequence Markov transition matrix (round 7)
# --------------------------------------------------------------------------

MARKOV_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
), trans AS (
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT prev_type, next_type,
       CAST(n AS BIGINT) AS n_transitions,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS prob
FROM trans
"""


@register(
    "events_markov_transitions",
    oracle=MARKOV_ORACLE,
    tags=("events", "analytics", "window"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for every
    consecutive event pair in each user's (ts, event_id)-ordered stream,
    count prev_type -> next_type transitions and row-normalize into
    transition probabilities — the model behind next-action prediction
    and funnel-anomaly alerts.

    Scale shape: one lag() window on the user_id partitioning (the same
    single corpus shuffle every sequence query here pays), then a
    type-pair-sized aggregate; the row normalization windows over the
    |types|^2-row aggregate, never the fact table."""
    events = load_table(spark, sf_dir, "events")
    seq = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total = F.sum("n_transitions").over(Window.partitionBy("prev_type"))
    return trans.select(
        "prev_type",
        "next_type",
        "n_transitions",
        round_to(F.col("n_transitions") / total, 6).alias("prob"),
    )


def _markov_transitions_bucketed(
    spark: SparkSession, sf_dir: str, bucket: str
) -> DataFrame:
    """Shared body of the bucketed Markov twins: the boundary-pair
    recovery documented on ``events_markov_transitions_bucketed`` is
    bucket-size-agnostic (only ADJACENT pairs are needed — within-bucket
    pairs from the local lag, cross-boundary pairs from the previous
    ACTIVE bucket's last event), so ``bucket`` picks the split
    granularity — "day" (default twin) or "hour" (round 10: the
    fallback for a single-day bot whose busiest day IS the straggler).

    Round 11 (verdict stretch #7): the bucket-edges aggregate no longer
    consumes the window output — it aggregates the PRE-window projection
    with pure min/max struct aggregates (first event = min(struct(ts,
    event_id, type)), exact vs the positional rn==1 election because
    event_id makes (ts, event_id) a total order, with struct ordering's
    nulls-first matching the window's asc_nulls_first; pinned on NULL-ts
    / NULL-type / NULL-day shapes in test_plans.py). The round-9 shape
    derived the aggregate from the window output to guarantee ONE scan
    via AQE exchange reuse — but that made the corpus-sized WindowExec
    (the per-bucket SORT, carrying the event_type string) execute once
    per consumer: on the 5M-row one-day 90%-hot corpus the day twin paid
    24.1 s vs the lifetime window's 13.9 s. The deliberate trade now: a
    SECOND column-pruned parquet scan feeding a map-side-combined
    aggregate (its shuffle is (user, bucket)-sized, never a straggler;
    scans parallelize perfectly at any scale) buys ONE corpus sort
    instead of two — measured 24.1 -> 12.9 s on that corpus, and the
    straggler task at 100 TB does half the work. Sessionization keeps
    the round-9 single-scan shape: its edges aggregate needs the
    window's running flag sum, so it cannot leave the window output."""
    events = load_table(spark, sf_dir, "events")
    bucket_col = F.to_date("ts") if bucket == "day" else F.date_trunc(bucket, F.col("ts"))
    keyed = events.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        "ts",
        "event_id",
        bucket_col.alias("d"),
    )
    w_local = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    pairs_local = keyed.select(
        F.lag("next_type").over(w_local).alias("prev_type"), "next_type"
    )
    day_edges = keyed.groupBy("user_id", "d").agg(
        F.max(F.struct("ts", "event_id", "next_type")).alias("last_ev"),
        # bucket-first event positionally = min by (ts, event_id); its
        # type (possibly NULL, preserved as NULL so the boundary pair
        # matches the lifetime twin's (prev, NULL) group) rides the
        # struct
        F.min(F.struct("ts", "event_id", "next_type")).alias("first_ev"),
    )
    w_days = Window.partitionBy("user_id").orderBy("d")
    boundary = day_edges.select(
        F.lag(F.col("last_ev.next_type")).over(w_days).alias("prev_type"),
        F.col("first_ev.next_type").alias("next_type"),
    )
    pairs = pairs_local.unionByName(boundary).filter(F.col("prev_type").isNotNull())
    trans = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    total = F.sum("n_transitions").over(Window.partitionBy("prev_type"))
    return trans.select(
        "prev_type",
        "next_type",
        "n_transitions",
        round_to(F.col("n_transitions") / total, 6).alias("prob"),
    )


@register(
    "events_markov_transitions_bucketed",
    oracle=MARKOV_ORACLE,
    tags=("events", "analytics", "window", "skew"),
)
def events_markov_transitions_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-user-safe Markov transitions (round 8): EXACTLY the same result
    as ``events_markov_transitions`` (same oracle — the hash match is the
    exactness proof), but the per-user sequence window is split by calendar
    day, so a pathological bot user that owns 90% of all events costs one
    sort per (user, day) instead of one unsplittable lifetime partition
    (AQE can split skewed joins, never Window partitions).

    Markov admits this split because it only needs ADJACENT pairs: a
    within-day lag() on the (user_id, day) partitioning yields all pairs
    inside a day, and the pairs that cross day boundaries are recovered
    from a combinable per-(user, day) first/last-event aggregate — last
    event of the user's previous ACTIVE day -> first event of this day via
    a lag() over the per-day relation (bounded by active days, not
    events). Measured crossover in BASELINE.md ("hot-user sequence-window
    bound"); for nastier single-day bots the bucket drops to hours
    (``events_markov_transitions_bucketed_hourly``) — same algebra
    (``_markov_transitions_bucketed``).

    Round 10 (advice fix): the day-first event is identified
    POSITIONALLY rather than by ``prev_type IS NULL``: lag(next_type)
    is also NULL for any row FOLLOWING a NULL-typed event, so on
    corpora with NULL event_type + non-null ts the old predicate could
    elect a mid-day event's type as first_type and diverge from the
    lifetime twin. Edge corpus ``null_type`` in tools/edge_sweep.py now
    exercises exactly that shape (round 11 moved the positional
    election into the edges aggregate itself — min(struct(ts, event_id,
    type)), exact because event_id totalizes the order; see
    ``_markov_transitions_bucketed`` for the one-sort-vs-one-scan
    trade that replaced the round-9 window-output dependency)."""
    return _markov_transitions_bucketed(spark, sf_dir, "day")


@register(
    "events_markov_transitions_bucketed_hourly",
    oracle=MARKOV_ORACLE,
    tags=("events", "analytics", "window", "skew"),
)
def events_markov_transitions_bucketed_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hour-bucketed Markov twin (round 10): EXACTLY the same transition
    matrix as ``events_markov_transitions`` (same oracle), with the
    sequence window split by (user_id, hour) — the fallback for a bot
    whose 90%-of-corpus activity lands in a SINGLE day, where the day
    twin's worst sort partition is that whole day. Markov's boundary
    algebra needs no gap condition at all (adjacent pairs only), so the
    bucket size is free — see ``_markov_transitions_bucketed``."""
    return _markov_transitions_bucketed(spark, sf_dir, "hour")


@register(
    "events_markov_transitions_auto",
    oracle=MARKOV_ORACLE,
    tags=("events", "analytics", "window", "skew"),
)
def events_markov_transitions_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-ROUTED Markov transitions (round 11, verdict task #3): the
    sessionization router's three-way rule transfers to Markov unchanged
    because the measured shape is the same — on the one-day 90%-hot
    corpus the hour twin WINS even on a single box (3.8 s vs the
    lifetime window's 13.9 s and the day twin's 31.1 s, BASELINE.md
    "one-day 90%-hot"), and on a cluster the lifetime/day stragglers
    stay one task while the hour twin splits. The fused sampled probe
    (``operators/skew.sequence_skew_profile``, 10% deterministic
    Bernoulli, one scan of the (user, day) projection) measures the
    hottest user's share and its busiest-day concentration; routing is
    lifetime below the ~0.35 crossover, day-bucketed above it,
    hour-bucketed when the hot key also concentrates >=50% in one
    calendar day. All three builders share THIS query's oracle
    (MARKOV_ORACLE), so the route can never change results — the
    official hash-green row certifies router + probes end-to-end.

    Attribution deliberately has NO auto twin: its hour twin loses on a
    single box (21.2 s vs lifetime 12.7 s — it pays two probe joins and
    a 7-leg lookback explode that pure window-algebra twins never pay)
    and wins only on cluster splittability, so routing it needs a
    cluster-size-aware threshold, not this crossover — see the ADR note
    in BASELINE.md ("attribution routing rule")."""
    from data_pipeline_with_spark_kafka_spark.operators.skew import choose_sequence_plan

    events = load_table(spark, sf_dir, "events")
    chosen, _share = choose_sequence_plan(
        events,
        "user_id",
        events_markov_transitions,
        events_markov_transitions_bucketed,
        hourly=events_markov_transitions_bucketed_hourly,
        ts_col="ts",
        sample_fraction=0.1,
    )
    return chosen(spark, sf_dir)


@register(
    "events_attribution_last_touch_bucketed",
    oracle=ATTRIBUTION_ORACLE,
    tags=("events", "analytics", "window", "skew"),
)
def events_attribution_last_touch_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-user-safe last-touch attribution (round 8): EXACTLY the same
    result as ``events_attribution_last_touch`` (same oracle — the hash
    match is the exactness proof), but the per-user carry window is split
    by calendar day, completing the skew-safe pair with the bucketed
    Markov twin (AQE can split skewed joins, never Window partitions).

    Attribution admits this split because the 7-DAY LOOKBACK bounds how
    far the carry reaches: the most recent preceding touch is either
    (a) same-day — a (user_id, day)-partitioned ignore-nulls last()
    window, or (b) the latest daily-last-touch among the 7 PRIOR days —
    a combinable per-(user, day) max(struct(ts, event_id, type))
    aggregate probed with a 7-way day-offset explode (any touch
    satisfying ts' >= ts - 7d lives in days D-7..D, so the probe is
    complete; a most-recent touch OLDER than 7 days and no touch at all
    both yield 'unattributed', exactly like the lifetime carry). The
    same 7-day filter then applies to the winning candidate."""
    events = load_table(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("view", "click")
    keyed = events.select(
        "event_id", "user_id", "ts", "event_type", "value", F.to_date("ts").alias("d")
    )
    w_local = (
        Window.partitionBy("user_id", "d")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = keyed.select(
        "event_id", "user_id", "ts", "event_type", "value", "d",
        F.last(
            F.when(is_touch, F.struct("ts", "event_id", "event_type")), ignorenulls=True
        )
        .over(w_local)
        .alias("sd_touch"),
    )
    purchases = carried.filter(F.col("event_type") == "purchase")
    daily = (
        keyed.filter(is_touch)
        .groupBy("user_id", "d")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("lt"))
    )
    probe = purchases.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(7)))).select(
        "event_id", "user_id", "ts", "value", "sd_touch",
        F.date_sub(F.col("d"), F.col("k")).alias("pd"),
    )
    # NULL-SAFE probe join (round 10): the lifetime carry window (and the
    # shared oracle) treat NULL user_id as one partition group, so a
    # NULL-user purchase with a prior-day NULL-user touch IS attributed —
    # a plain equi-join dropped it to 'unattributed' (caught by the
    # null_user rows in tools/edge_sweep.py's null_type corpus; latent
    # for two rounds because no corpus had NULL user_id with valid ts).
    daily_r = daily.withColumnsRenamed({"user_id": "d_user_id", "d": "d_pd"})
    prior = (
        probe.join(
            daily_r,
            F.col("user_id").eqNullSafe(F.col("d_user_id"))
            & F.col("pd").eqNullSafe(F.col("d_pd")),
            "left",
        )
        .groupBy("event_id", "user_id", "ts", "value", "sd_touch")
        .agg(F.max("lt").alias("prior_touch"))
    )
    best = F.coalesce(F.col("sd_touch"), F.col("prior_touch"))
    attributed = prior.select(
        F.when(
            best.isNotNull()
            & (best["ts"] >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
            best["event_type"],
        )
        .otherwise(F.lit("unattributed"))
        .alias("touch_type"),
        "value",
        "user_id",
    )
    return attributed.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        round_to(F.sum("value"), 4).alias("attributed_value"),
    )


@register(
    "events_attribution_last_touch_bucketed_hourly",
    oracle=ATTRIBUTION_ORACLE,
    tags=("events", "analytics", "window", "skew"),
)
def events_attribution_last_touch_bucketed_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hour-bucketed attribution twin (round 10): EXACTLY the same
    last-touch result as ``events_attribution_last_touch`` (same oracle),
    completing the hour fallback across the whole sequence family — the
    day twin's same-day carry window is the straggler on a single-day
    bot (measured 24.2 s vs lifetime 18.2 s on the one-day 90%-hot
    corpus, BASELINE.md).

    The same-day carry decomposes at hour boundaries in two tiers:

    - SAME-HOUR: an ignore-nulls last() over the (user_id, hour)
      partitioning, rows-preceding — the only corpus-sized window, and
      its worst partition is the bot's busiest hour;
    - PRIOR HOURS of the same day: an hourly last-touch relation built
      over ALL events (so every purchase's hour is present, with a NULL
      touch when the hour had none — the relation is groupBy'd from the
      carry window's output, so the (user, hour) corpus exchange is
      shared) + one running ignore-nulls last() over the per-(user, day)
      hours relation (<= 24 rows per partition), probed by a null-safe
      (user, hour) join;
    - PRIOR DAYS: unchanged from the day twin — the daily last-touch
      rolls up from the hourly relation and the 7-way day-offset probe
      is complete for the 7x24h lookback (null-safe, round-10 NULL-user
      discipline).

    Recency ordering makes coalesce(same_hour, prior_hours, prior_days)
    exact (each tier is strictly older than the previous), and only the
    prior-days candidate can fall outside the 7-day filter."""
    events = load_table(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("view", "click")
    keyed = events.select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.to_date("ts").alias("d"),
        F.date_trunc("hour", F.col("ts")).alias("h"),
    )
    w_local = (
        Window.partitionBy("user_id", "h")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = keyed.withColumn(
        "sh_touch",
        F.last(
            F.when(is_touch, F.struct("ts", "event_id", "event_type")), ignorenulls=True
        ).over(w_local),
    )
    hourly = carried.groupBy("user_id", "d", "h").agg(
        F.max(F.when(is_touch, F.struct("ts", "event_id", "event_type"))).alias("hl")
    )
    w_hours = (
        Window.partitionBy("user_id", "d")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hours_prev = hourly.select(
        "user_id", "d", "h",
        F.last("hl", ignorenulls=True).over(w_hours).alias("pd_touch"),
        "hl",
    )
    daily = hours_prev.groupBy("user_id", "d").agg(F.max("hl").alias("lt"))
    purchases = carried.filter(F.col("event_type") == "purchase")
    hp = hours_prev.select(
        F.col("user_id").alias("hp_user_id"),
        F.col("h").alias("hp_h"),
        "pd_touch",
    )
    with_pd = purchases.join(
        hp,
        F.col("user_id").eqNullSafe(F.col("hp_user_id"))
        & F.col("h").eqNullSafe(F.col("hp_h")),
        "left",
    ).select("event_id", "user_id", "ts", "value", "d", "sh_touch", "pd_touch")
    probe = with_pd.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(7)))).select(
        "event_id", "user_id", "ts", "value", "sh_touch", "pd_touch",
        F.date_sub(F.col("d"), F.col("k")).alias("pd"),
    )
    daily_r = daily.select(
        F.col("user_id").alias("d_user_id"), F.col("d").alias("d_pd"), "lt"
    )
    prior = (
        probe.join(
            daily_r,
            F.col("user_id").eqNullSafe(F.col("d_user_id"))
            & F.col("pd").eqNullSafe(F.col("d_pd")),
            "left",
        )
        .groupBy("event_id", "user_id", "ts", "value", "sh_touch", "pd_touch")
        .agg(F.max("lt").alias("prior_touch"))
    )
    best = F.coalesce(F.col("sh_touch"), F.col("pd_touch"), F.col("prior_touch"))
    attributed = prior.select(
        F.when(
            best.isNotNull()
            & (best["ts"] >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
            best["event_type"],
        )
        .otherwise(F.lit("unattributed"))
        .alias("touch_type"),
        "value",
        "user_id",
    )
    return attributed.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        round_to(F.sum("value"), 4).alias("attributed_value"),
    )


def _session_ids_bucketed(spark: SparkSession, sf_dir: str, bucket: str) -> DataFrame:
    """Shared body of the bucketed sessionization twins: the boundary-
    correction algebra documented on ``events_session_ids_bucketed`` is
    bucket-size-agnostic (only the ADJACENT previous event and a prefix
    sum of per-bucket totals are needed), so ``bucket`` picks the split
    granularity — "day" (default twin) or "hour" (round 10: the fallback
    for a single-day bot whose busiest DAY is itself the straggler; an
    hour bucket caps the worst sort partition at the bot's busiest hour,
    same algebra, same oracle)."""
    events = load_table(spark, sf_dir, "events")
    bucket_col = F.to_date("ts") if bucket == "day" else F.date_trunc(bucket, F.col("ts"))
    keyed = events.select(
        "user_id", "ts", "event_id", bucket_col.alias("d")
    )
    w_local = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    run_local = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_local = F.lag("ts").over(w_local)
    flagged = keyed.withColumn(
        "flag_local",
        F.when(
            prev_local.isNull()
            | (F.col("ts") - prev_local > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    local = flagged.withColumn("local_run", F.sum("flag_local").over(run_local))
    day_edges = local.groupBy("user_id", "d").agg(
        F.min(F.struct("ts", "event_id")).alias("first_ev"),
        F.max(F.struct("ts", "event_id")).alias("last_ev"),
        F.max("local_run").alias("flag_sum"),
    )
    w_days = Window.partitionBy("user_id").orderBy("d")
    prev_last_ts = F.lag(F.col("last_ev.ts")).over(w_days)
    corr = F.when(
        prev_last_ts.isNotNull()
        & (F.col("first_ev.ts") - prev_last_ts <= F.expr("INTERVAL 30 MINUTES")),
        F.lit(-1).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    day_adj = day_edges.withColumn("day_total", F.col("flag_sum") + corr).select(
        "user_id",
        "d",
        (
            corr
            + F.coalesce(
                F.sum("day_total").over(
                    w_days.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            )
        ).alias("adj"),
    )
    # NULL-SAFE join keys: Window partitions and groupBy treat NULL
    # (user_id, d) as a regular group, so the adjustment join must too —
    # a plain equi-join drops null-ts/null-user rows that the lifetime
    # window sessionizes (caught by the all_null edge corpus).
    adj_side = day_adj.withColumnsRenamed({"user_id": "adj_user_id", "d": "adj_d"})
    ids = local.join(
        adj_side,
        F.col("user_id").eqNullSafe(F.col("adj_user_id"))
        & F.col("d").eqNullSafe(F.col("adj_d")),
    ).select(
        "user_id",
        "ts",
        (F.col("local_run") + F.col("adj")).cast("long").alias("session_seq"),
    )
    return ids.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "events_session_ids_bucketed",
    oracle=SESSION_IDS_ORACLE,
    tags=("events", "window", "skew"),
)
def events_session_ids_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-user-safe sessionization (round 9): EXACTLY the same result as
    ``events_session_ids`` (same oracle — the hash match is the exactness
    proof), but the per-user gap/running-sum windows are split by calendar
    day, closing the last lifetime-window straggler in the sequence family
    (measured 1.3 -> 10.1 s at hot_frac 0.9 in BASELINE.md; AQE can split
    skewed joins, never Window partitions).

    Sessionization admits the split because the gap flag only needs the
    ADJACENT previous event, and session_seq is a prefix sum of flags —
    both decompose at day boundaries:

    - WITHIN a (user, day) partition, lag() + running sum give each row a
      local flag (day-first event provisionally flagged 1) and a local
      prefix sum;
    - the day-first event's TRUE flag needs only the previous ACTIVE
      day's last event: a per-(user, day) (first_ev, last_ev, flag_sum)
      aggregate — combinable, bounded by active days, riding the SAME
      (user_id, d) partitioning as the local window — plus one lag() over
      that per-day relation yields a correction corr in {0, -1} (-1 when
      the boundary gap is <= 30 min, merging the day's first session into
      the previous day's last);
    - session_seq = local_run + corr(day) + sum over PRIOR days of
      (flag_sum + corr) — the per-day exclusive prefix sum of corrected
      day totals. corr applies to every row of the day because the
      day-first flag participates in every local prefix.

    Scale shape: the corpus shuffles once on (user_id, d) — the straggler
    cap is the hot user's busiest day — then the per-day relation (active
    days, not events) pays the only per-user window, and the
    adjustment joins back on (user_id, d), reusing the partitioning. For
    nastier single-day bots the bucket drops to hours
    (``events_session_ids_bucketed_hourly``); same algebra
    (``_session_ids_bucketed``)."""
    return _session_ids_bucketed(spark, sf_dir, "day")


@register(
    "events_session_ids_bucketed_hourly",
    oracle=SESSION_IDS_ORACLE,
    tags=("events", "window", "skew"),
)
def events_session_ids_bucketed_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-bucketed sessionization twin (round 10, verdict task #6):
    EXACTLY the same result as ``events_session_ids`` (same oracle), with
    the split window partitioned by (user_id, hour) instead of day — the
    fallback for the one skew shape the day twin cannot split, a bot
    whose 90%-of-corpus activity lands in a SINGLE day (the day twin's
    worst sort partition is then that whole day). The boundary-correction
    algebra is bucket-size-agnostic — see ``_session_ids_bucketed`` —
    and a 30-minute gap can still occur inside a 60-minute bucket, so
    nothing else changes. Measured flat on the one-day 90%-hot corpus in
    BASELINE.md (tools/hot_user_skew.py --single-day)."""
    return _session_ids_bucketed(spark, sf_dir, "hour")


@register(
    "events_session_ids_auto",
    oracle=SESSION_IDS_ORACLE,
    tags=("events", "window", "skew"),
)
def events_session_ids_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-ROUTED sessionization (round 10, verdict task #2): the
    executable operating rule itself as a registry query. A sampled
    dominant-key probe (``operators/skew.dominant_key_share``, 10%
    deterministic Bernoulli, one map-side-combined aggregate over the
    sampled key column only) measures the hottest user's share, and
    ``operators/skew.choose_sequence_plan`` routes to the lifetime
    window below the measured hot_frac ~0.35 crossover, the
    day-bucketed twin above it, or the HOUR-bucketed twin when the hot
    key also concentrates >=50% of its rows in one calendar day (the
    second probe, ``hot_key_day_concentration`` — the single-day bot
    whose hot day defeats the day split). All three builders share THIS
    query's oracle, so the routing can never change results — the
    official hash-green row certifies the router end-to-end, probes
    included (on organic driver data the probe measures a cold share
    and takes the lifetime branch; tests/test_scale_ops.py pins all
    three routes on crafted corpora and the exact twin equality either
    way)."""
    from data_pipeline_with_spark_kafka_spark.operators.skew import choose_sequence_plan

    events = load_table(spark, sf_dir, "events")
    chosen, _share = choose_sequence_plan(
        events,
        "user_id",
        events_session_ids,
        events_session_ids_bucketed,
        hourly=events_session_ids_bucketed_hourly,
        ts_col="ts",
        sample_fraction=0.1,
    )
    return chosen(spark, sf_dir)


# --------------------------------------------------------------------------
# Seasonal (day-of-week) volume anomaly detection (round 7)
# --------------------------------------------------------------------------

DOW_ANOMALY_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt
    FROM events GROUP BY 1
), keyed AS (
    -- engine-neutral day-of-week: 1970-01-01 is a Thursday, so
    -- (epoch_days + 4) % 7 gives 0=Sunday on ANY engine (Spark's
    -- dayofweek() is 1-based, DuckDB's 0-based — don't touch either).
    SELECT d, cnt, (datediff('day', DATE '1970-01-01', d) + 4) % 7 AS dow
    FROM daily
), stats AS (
    SELECT dow, AVG(cnt) AS mu, STDDEV_SAMP(cnt) AS sigma, COUNT(*) AS n_days
    FROM keyed GROUP BY dow
)
SELECT CAST(k.d AS VARCHAR) AS day, CAST(k.cnt AS BIGINT) AS n_events,
       CAST(k.dow AS INT) AS dow,
       CASE WHEN s.sigma IS NULL OR s.sigma = 0 THEN NULL
            ELSE ROUND((k.cnt - s.mu) / s.sigma, 4) END AS z,
       CASE WHEN s.sigma IS NULL OR s.sigma = 0 THEN false
            ELSE ABS((k.cnt - s.mu) / s.sigma) > 2 END AS is_anomaly
FROM keyed k JOIN stats s USING (dow)
"""


@register(
    "events_anomaly_dow",
    oracle=DOW_ANOMALY_ORACLE,
    tags=("events", "monitoring"),
)
def events_anomaly_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal volume anomaly detection: each day's event count scored
    against ITS OWN day-of-week baseline (weekends vs weekdays have
    different normals — a global z-score flags every Saturday). The
    monitoring alarm a streaming ingest dashboard runs.

    Scale shape: one map-side-combinable daily aggregate over the fact
    table, then day-of-week stats and the join both operate on
    calendar-sized relations (365 rows/year) — nothing corpus-sized
    shuffles twice. Day-of-week derives from epoch days ((days+4) % 7,
    0=Sunday) because Spark's dayofweek() is 1-based and DuckDB's
    0-based — the arithmetic form is engine-neutral by construction."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    keyed = daily.withColumn(
        "dow", (F.datediff("d", F.lit("1970-01-01")) + F.lit(4)) % 7
    )
    stats = keyed.groupBy("dow").agg(
        F.avg("cnt").alias("mu"),
        F.stddev_samp("cnt").alias("sigma"),
    )
    j = keyed.join(F.broadcast(stats), "dow")
    z_raw = (F.col("cnt") - F.col("mu")) / F.col("sigma")
    degenerate = F.col("sigma").isNull() | (F.col("sigma") == 0)
    return j.select(
        # string form: pandas renders a DuckDB DATE as a midnight
        # Timestamp, so a date-typed column hash-mismatches the canon.
        F.col("d").cast("string").alias("day"),
        F.col("cnt").alias("n_events"),
        F.col("dow").cast("int").alias("dow"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(round_to(z_raw, 4))
        .alias("z"),
        F.when(degenerate, F.lit(False))
        .otherwise(F.abs(z_raw) > 2)
        .alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# Funnel time-to-convert distribution (round 7)
# --------------------------------------------------------------------------

TIME_TO_CONVERT_ORACLE = """
WITH s AS (
    SELECT user_id, MIN(ts) AS signup_ts
    FROM events WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
    SELECT e.user_id,
           (epoch_us(MIN(e.ts)) - epoch_us(s.signup_ts)) / 3600000000.0 AS hours
    FROM events e JOIN s USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
    GROUP BY e.user_id, s.signup_ts
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(hours, 0.5), 4) AS median_hours,
       ROUND(quantile_cont(hours, 0.9), 4) AS p90_hours,
       ROUND(AVG(hours), 4) AS mean_hours
FROM conv
"""


@register(
    "events_time_to_convert",
    oracle=TIME_TO_CONVERT_ORACLE,
    tags=("events", "analytics"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> first-purchase latency distribution: hours from each
    user's first signup to their first purchase strictly after it;
    median / p90 / mean over converting users — the funnel metric
    product teams actually track (events_funnel_conversion counts WHO
    converts; this measures HOW FAST).

    Scale shape: two user-keyed aggregates and one user-keyed join (the
    signup relation is per-user, joined back to purchases on the same
    user_id hashing), then one exact-percentile aggregate over the
    per-user latency relation (constant state). No windows."""
    events = load_table(spark, sf_dir, "events")
    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("first_purchase"))
        .select(
            # timestampdiff is CIVIL arithmetic, defined for TIMESTAMP_NTZ
            # (events.ts is NTZ under a vanilla driver session, where
            # unix_micros would not resolve) and exactly mirrors DuckDB's
            # epoch_us difference on its tz-less TIMESTAMP.
            (
                F.expr("timestampdiff(MICROSECOND, signup_ts, first_purchase)")
                / F.lit(3_600_000_000.0)
            ).alias("hours")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        round_to(F.percentile("hours", F.lit(0.5)), 4).alias("median_hours"),
        round_to(F.percentile("hours", F.lit(0.9)), 4).alias("p90_hours"),
        round_to(F.avg("hours"), 4).alias("mean_hours"),
    )
