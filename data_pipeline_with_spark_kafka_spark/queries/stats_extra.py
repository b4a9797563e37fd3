"""Distribution-window and bivariate-statistics queries.

Fills the last §2.6 analytic-window gaps (ntile / percent_rank /
cume_dist) and adds the bivariate aggregate family (corr / covariance /
least-squares regression) every analytics engine ships.

Scale notes (100 TB design):
- ``window_distribution_funcs`` is ONE window shuffle partitioned by
  segment; the order key is (acctbal, custkey) so the total order — and
  therefore ntile bucket assignment — is deterministic under ties on
  both engines.
- ``agg_corr_covar`` is a single map-side-combinable groupBy: corr /
  covar / regr_* all reduce to the same six running sums
  (n, Σx, Σy, Σxy, Σx², Σy²), so the shuffle carries O(groups) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table, load_table_fanned

WINDOW_DISTRIBUTION_ORACLE = """
SELECT c_custkey,
       c_mktsegment,
       c_acctbal,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cum_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@register("window_distribution_funcs", oracle=WINDOW_DISTRIBUTION_ORACLE, tags=("window",))
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment account-balance distribution: quartile (ntile),
    percent_rank and cume_dist. Order key includes the primary key so
    tied balances still produce a deterministic bucket assignment."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        round_to(F.percent_rank().over(w), 6).alias("pct_rank"),
        round_to(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


AGG_CORR_COVAR_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS qty_price_covar_pop,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS price_per_qty_slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS price_per_qty_intercept
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_corr_covar", oracle=AGG_CORR_COVAR_ORACLE, tags=("agg", "stats"))
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics of quantity vs extended price per return
    flag: Pearson correlation, sample/population covariance, and the
    least-squares fit (slope + intercept). One combinable aggregate.

    corr is computed as covar_pop / nullif(stddev_pop*stddev_pop, 0) —
    the same Welford co-moments F.corr reduces, but null-safe: ANSI
    Spark's corr() raises DIVIDE_BY_ZERO on a zero-variance column
    where DuckDB's CORR yields NULL (round-8 one-group edge corpus)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    corr_safe = F.covar_pop(q, p) / F.nullif(
        F.stddev_pop(q) * F.stddev_pop(p), F.lit(0.0)
    )
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        round_to(corr_safe, 6).alias("qty_price_corr"),
        round_to(F.covar_samp(q, p), 4).alias("qty_price_covar"),
        round_to(F.covar_pop(q, p), 4).alias("qty_price_covar_pop"),
        round_to(F.regr_slope(p, q), 4).alias("price_per_qty_slope"),
        round_to(F.regr_intercept(p, q), 4).alias("price_per_qty_intercept"),
    )


WINSORIZE_ORACLE = """
WITH q AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS lo,
         quantile_cont(o_totalprice, 0.95) AS hi
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderkey, o.o_orderpriority,
       ROUND(LEAST(GREATEST(o.o_totalprice, q.lo), q.hi), 4) AS price_winsorized,
       o.o_totalprice < q.lo OR o.o_totalprice > q.hi AS was_clipped
FROM orders o JOIN q USING (o_orderpriority)
"""


@register("stats_winsorize_prices", oracle=WINSORIZE_ORACLE, tags=("stats", "quality"))
def stats_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority winsorization: clip order totals to the group's
    exact [p05, p95] (linear-interpolated percentile on both engines).
    The percentile relation is |groups| rows; AQE elects the broadcast
    at runtime (no hard hint — the lint treats hint-on-aggregate-of-fact
    as a scale hazard), so the fact table shuffles only for the group
    aggregate in practice."""
    orders = load_table(spark, sf_dir, "orders")
    q = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("hi"),
    )
    return orders.join(q, "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        round_to(
            F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")), 4
        ).alias("price_winsorized"),
        ((F.col("o_totalprice") < F.col("lo")) | (F.col("o_totalprice") > F.col("hi"))).alias(
            "was_clipped"
        ),
    )


MAD_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
), fence AS (
  SELECT m.event_type, m.med, d.mad,
         m.med - 3 * 1.4826 * d.mad AS lo,
         m.med + 3 * 1.4826 * d.mad AS hi
  FROM med m JOIN mad d USING (event_type)
)
SELECT f.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(f.med, 4) AS med, ROUND(f.mad, 4) AS mad,
       CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM events e JOIN fence f USING (event_type)
GROUP BY f.event_type, f.med, f.mad
"""


@register("stats_mad_outliers", oracle=MAD_ORACLE, tags=("stats", "quality"))
def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute
    deviation fences (med ± 3·1.4826·MAD — the robust z-score that a
    35% contamination cannot drag, unlike mean/stddev). Three passes
    over the fact table, but every intermediate relation (medians,
    MADs, fences) is |groups| rows — AQE elects their broadcast at
    runtime; no fact-fact join and no hard hints."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        events.join(med, "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
        )
    )
    fence = med.join(mad, "event_type").select(
        "event_type",
        "med",
        "mad",
        (F.col("med") - 3 * 1.4826 * F.col("mad")).alias("lo"),
        (F.col("med") + 3 * 1.4826 * F.col("mad")).alias("hi"),
    )
    out_flag = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        events.join(fence, "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(out_flag, 1).otherwise(0)).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            round_to("med", 4).alias("med"),
            round_to("mad", 4).alias("mad"),
            "n_outliers",
        )
    )


KEY_SKEW_ORACLE = """
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id
), t AS (SELECT SUM(n) AS tot FROM c)
SELECT user_id, n, ROUND(n / tot, 6) AS share
FROM c, t ORDER BY n DESC, user_id LIMIT 20
"""


@register("diag_key_skew", oracle=KEY_SKEW_ORACLE, tags=("diagnostics",))
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic: the 20 heaviest join/agg keys and their
    share of all rows — the relation you read before deciding to salt
    (operators/skew.py) or let AQE split. Key counts + a 1-row total
    broadcast + TakeOrderedAndProject."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    return (
        c.crossJoin(F.broadcast(t))
        .select("user_id", "n", round_to(F.col("n") / F.col("tot"), 6).alias("share"))
        .orderBy(F.desc("n"), "user_id")
        .limit(20)
    )


MIN_BY_MAX_BY_ORACLE = """
SELECT c_mktsegment,
       arg_max(c_name, ROUND(c_acctbal * 100) * 1000000000 + c_custkey) AS richest_customer,
       arg_min(c_name, ROUND(c_acctbal * 100) * 1000000000 + c_custkey) AS poorest_customer,
       ROUND(MAX(c_acctbal), 4) AS max_bal,
       ROUND(MIN(c_acctbal), 4) AS min_bal
FROM customer GROUP BY c_mktsegment
"""


@register("agg_min_by_max_by", oracle=MIN_BY_MAX_BY_ORACLE, tags=("agg",))
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (arg_max / arg_min): which customer holds each
    segment's extreme balance. The ordering key packs (acctbal,
    custkey) into one double because neither engine's arg_max takes a
    composite key portably: round(acctbal*100) is the exact integer
    cent value (TPC-H acctbal has 2 decimals), scaled by 1e9 so the
    smallest balance gap (1 cent) dominates any custkey < 1e9 (TPC-H
    sf ~6600; the packed value stays < 1e15 < 2^53, so the double is
    exact and ties on balance break deterministically by key)."""
    customer = load_table(spark, sf_dir, "customer")
    ordkey = F.round(F.col("c_acctbal") * 100, 0) * 1_000_000_000 + F.col("c_custkey")
    return customer.groupBy("c_mktsegment").agg(
        F.max_by("c_name", ordkey).alias("richest_customer"),
        F.min_by("c_name", ordkey).alias("poorest_customer"),
        round_to(F.max("c_acctbal"), 4).alias("max_bal"),
        round_to(F.min("c_acctbal"), 4).alias("min_bal"),
    )


STRING_AGG_ORACLE = """
SELECT n_name,
       string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segments_sorted,
       CAST(COUNT(*) AS BIGINT) AS n_segments
FROM (SELECT DISTINCT n.n_name, c.c_mktsegment
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
GROUP BY n_name
"""


@register("agg_string_concat_per_group", oracle=STRING_AGG_ORACLE, tags=("agg", "string"))
def agg_string_concat_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): the distinct
    market segments present per nation, '|'-joined in sorted order —
    deterministic because the order is explicit on both engines. Spark:
    sort_array(collect_set) + array_join (one combinable aggregate).
    All-NULL group -> NULL (string_agg semantics): collect_set drops
    NULLs, so an empty set means no non-null input — emit NULL, not ''
    (round-8 all-NULL edge corpus)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    pairs = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_mktsegment")
        .distinct()
    )
    segs = F.sort_array(F.collect_set("c_mktsegment"))
    return pairs.groupBy("n_name").agg(
        F.when(F.size(segs) > 0, F.array_join(segs, "|")).alias("segments_sorted"),
        F.count(F.lit(1)).alias("n_segments"),
    )


NTH_VALUE_ORACLE = """
SELECT c_mktsegment,
       c_custkey,
       nth_value(c_name, 3) OVER w AS third_richest_name,
       first_value(c_name) OVER w AS richest_name,
       last_value(c_name) OVER w AS poorest_name
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("window_nth_value", oracle=NTH_VALUE_ORACLE, tags=("window",))
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value navigation over an unbounded frame: each
    customer row sees its segment's 1st/3rd/last names by balance
    (unique compound order key -> deterministic on both engines)."""
    customer = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return customer.select(
        "c_mktsegment",
        "c_custkey",
        F.nth_value("c_name", 3).over(w).alias("third_richest_name"),
        F.first("c_name").over(w).alias("richest_name"),
        F.last("c_name").over(w).alias("poorest_name"),
    )


BOOLEAN_AGG_ORACLE = """
SELECT c_mktsegment,
       bool_and(c_acctbal > -1000) AS none_deeply_negative,
       bool_or(c_acctbal > 9000) AS has_high_balance,
       CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative,
       CAST(any_value(c_nationkey >= 0) AS BOOLEAN) AS sanity_any
FROM customer GROUP BY c_mktsegment
"""


@register("agg_boolean_family", oracle=BOOLEAN_AGG_ORACLE, tags=("agg",))
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: bool_and / bool_or / count_if (+ an
    any_value over a constant-true predicate, deterministic by
    construction). One combinable aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.bool_and(F.col("c_acctbal") > -1000).alias("none_deeply_negative"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("has_high_balance"),
        F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
        F.any_value(F.col("c_nationkey") >= 0).alias("sanity_any"),
    )


COLUMN_PROFILE_ORACLE = """
SELECT 'o_totalprice' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(o_totalprice) AS BIGINT) AS n_non_null,
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
       ROUND(MIN(o_totalprice), 4) AS min_value,
       ROUND(MAX(o_totalprice), 4) AS max_value,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50
FROM orders
UNION ALL
SELECT 'o_custkey',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(o_custkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       ROUND(MIN(o_custkey), 4), ROUND(MAX(o_custkey), 4),
       ROUND(quantile_cont(o_custkey, 0.5), 4)
FROM orders
"""


@register("diag_column_profile", oracle=COLUMN_PROFILE_ORACLE, tags=("diagnostics", "quality"))
def diag_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator (the ANALYZE-style read a pipeline runs
    on a new source before trusting it): per-column row/null/distinct
    counts, min/max, exact median, in long form (column_name, stats).

    Shape: one single-distinct aggregate PER COLUMN, unioned — NOT one
    multi-distinct aggregate, which Catalyst expands by duplicating
    every input row once per distinct column (the Expand operator
    turned a 2-column profile into a 3x row blow-up; measured 2.7 s ->
    1.3 s at sf0.1 from this split). Each per-column pass scans a
    pruned 1-column projection. Distinct counts are exact here; swap
    in approx_count_distinct when profiling 100 TB."""
    orders = load_table(spark, sf_dir, "orders")

    def profile(c: str) -> DataFrame:
        col = F.col(c).cast("double")
        return orders.agg(
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_non_null"),
            F.countDistinct(col).alias("n_distinct"),
            round_to(F.min(col), 4).alias("min_value"),
            round_to(F.max(col), 4).alias("max_value"),
            round_to(F.percentile(col, F.lit(0.5)), 4).alias("p50"),
        )

    return profile("o_totalprice").unionByName(profile("o_custkey"))


AFFINITY_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders_together
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY n_orders_together DESC, part_a, part_b
LIMIT 25
"""


@register("affinity_part_pairs", oracle=AFFINITY_ORACLE, tags=("analytics", "join"))
def affinity_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 25 part pairs most often ordered
    together. Pair expansion is <= C(lines-per-order, 2) per order — a
    bounded blow-up, not a cartesian — via the round-8 single-shuffle
    ``co_occurrence_pairs`` primitive (collect_set + expression-side
    pair explode; the old order-keyed self-join paid three shuffles).
    Top-k via TakeOrderedAndProject with a full tiebreak."""
    from data_pipeline_with_spark_kafka_spark.operators.graph import (
        co_occurrence_pairs,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = co_occurrence_pairs(lineitem, "l_orderkey", "l_partkey").select(
        F.col("pa").alias("part_a"), F.col("pb").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .orderBy(F.desc("n_orders_together"), "part_a", "part_b")
        .limit(25)
    )


AB_TEST_ORACLE = """
WITH arms AS (
  SELECT user_id % 2 AS variant,
         CAST(COUNT(*) AS BIGINT) AS n_trials,
         CAST(SUM(CASE WHEN value > 70 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id % 2
), wide AS (
  SELECT MAX(CASE WHEN variant = 0 THEN n_trials END) AS n0,
         MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
         MAX(CASE WHEN variant = 1 THEN n_trials END) AS n1,
         MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
  FROM arms
)
SELECT n0, c0, n1, c1,
       ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS rate_a,
       ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS rate_b,
       -- pooled rate 0 or 1 makes the pooled variance 0 and z undefined
       -- (e.g. every trial converts): NULL, not a divide-by-zero (the
       -- round-9 day_boundary edge corpus crashed the unguarded form)
       ROUND(CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
                  ELSE (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             / SQRT((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)) END, 4) AS z_stat
FROM wide
"""


@register("stats_ab_test_ztest", oracle=AB_TEST_ORACLE, tags=("stats", "analytics"))
def stats_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic A/B assignment
    (user_id parity): each purchase event is a trial, success = order
    value above 70; per-arm counts -> pooled-variance z statistic. The
    inference math runs on the 2-row arms relation; only the trial
    collapse touches the corpus (filter pushed to the scan)."""
    events = load_table(spark, sf_dir, "events")
    arms = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy((F.col("user_id") % 2).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n_trials"),
            F.sum(F.when(F.col("value") > 70, 1).otherwise(0)).alias("n_converted"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_trials"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_trials"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    r0 = F.col("c0").cast("double") / F.col("n0")
    r1 = F.col("c1").cast("double") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    # Degenerate pooled rate (0 or 1) => zero pooled variance, z
    # undefined: CASE-guard to NULL — under ANSI mode the unguarded
    # division raises DIVIDE_BY_ZERO when every trial converts (caught
    # by the round-9 day_boundary edge corpus); mirrored in the oracle.
    conv = F.col("c0") + F.col("c1")
    z = F.when(
        (conv > 0) & (conv < F.col("n0") + F.col("n1")),
        (r1 - r0)
        / F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))),
    )
    return wide.select(
        "n0", "c0", "n1", "c1",
        round_to(r0, 6).alias("rate_a"),
        round_to(r1, 6).alias("rate_b"),
        round_to(z, 4).alias("z_stat"),
    )


GINI_ORACLE = """
WITH spend AS (
  SELECT o_custkey, SUM(o_totalprice) AS revenue
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT revenue,
         ROW_NUMBER() OVER (ORDER BY revenue, o_custkey) AS i,
         COUNT(*) OVER () AS n,
         SUM(revenue) OVER () AS total
  FROM spend
)
-- COALESCE: MAX over the empty ranked relation is NULL, but the Spark
-- side counts customers (0 on an empty orders table).
SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n_customers,
       ROUND(MAX(total), 4) AS total_revenue,
       ROUND(2.0 * SUM(i * revenue) / (MAX(n) * MAX(total))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini
FROM ranked
"""


@register("stats_gini_revenue", oracle=GINI_ORACLE, tags=("stats", "analytics"))
def stats_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer revenue (the inequality metric a
    curation pipeline also runs on per-domain token mass): rank-weighted
    sum formula G = 2*Σ(i·x_i)/(n·Σx) − (n+1)/n over revenue ranked
    ascending with a key tiebreak. The global rank runs over the
    |customers| aggregate, not raw orders; at 100 TB swap row_number
    for the range-partitioned rank in llm_deterministic_shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("revenue", "o_custkey")
    ranked = spend.select(
        "revenue",
        F.row_number().over(w).alias("i"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        round_to(F.sum("revenue"), 4).alias("total_revenue"),
        round_to(
            2.0 * F.sum(F.col("i") * F.col("revenue"))
            / (F.count(F.lit(1)) * F.sum("revenue"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Quantile discretization (feature bucketing)
# --------------------------------------------------------------------------
#
# The feature-engineering staple: bucket a numeric column into B
# equal-mass bins via exact interpolated percentile cut points, then
# profile each bucket. Two passes at any scale: one percentile aggregate
# (constant state, 9 doubles out) and one bucketed group-by; the cut
# points travel as a broadcast 1-row relation, rounded to 4dp on BOTH
# engines so boundary comparisons run on identical doubles.

QUANTILE_BUCKETS_ORACLE = """
WITH cuts AS (
    SELECT [ROUND(c, 4) FOR c IN
            quantile_cont(o_totalprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])] AS cs
    FROM orders
), labeled AS (
    SELECT len(list_filter(cuts.cs, c -> o.o_totalprice > c)) AS bucket,
           o.o_totalprice AS x
    FROM orders o, cuts
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(MIN(x), 4) AS lo,
       ROUND(MAX(x), 4) AS hi,
       ROUND(AVG(x), 4) AS mean_price
FROM labeled
GROUP BY bucket
"""


@register("stats_quantile_discretize", oracle=QUANTILE_BUCKETS_ORACLE, tags=("stats",))
def stats_quantile_discretize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile discretization of order totals: exact interpolated cut
    points (one constant-state percentile aggregate), bucket = number of
    cut points strictly below the value (identical tie semantics on both
    engines after 4dp cut rounding), per-bucket count/min/max/mean."""
    orders = load_table(spark, sf_dir, "orders")
    qs = [i / 10.0 for i in range(1, 10)]
    cuts = orders.agg(
        F.transform(
            F.percentile("o_totalprice", F.array(*[F.lit(q) for q in qs])),
            lambda c: round_to(c, 4),
        ).alias("cs")
    )
    labeled = orders.crossJoin(F.broadcast(cuts)).select(
        F.size(F.filter(F.col("cs"), lambda c: F.col("o_totalprice") > c)).alias("bucket"),
        F.col("o_totalprice").alias("x"),
    )
    return labeled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        round_to(F.min("x"), 4).alias("lo"),
        round_to(F.max("x"), 4).alias("hi"),
        round_to(F.avg("x"), 4).alias("mean_price"),
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (round 7)
# --------------------------------------------------------------------------
#
# The classic CRM segmentation: per-customer Recency / Frequency /
# Monetary metrics, quartile-coded 1..4 per dimension, rolled up to
# segment sizes. The quartile coding deliberately reuses the
# stats_quantile_discretize discipline — exact interpolated percentile
# CUT POINTS (one constant-state aggregate, rounded on both engines)
# compared per row — instead of ntile(4), whose unpartitioned window
# would sort the whole per-customer relation on one task at scale.
#
# Money rounds at CENTS (2dp), not 4dp: monetary sums reach ~1e6-1e7,
# where double partial-agg order costs ~1e-8 absolute — a 4dp round
# (tie at 5e-5) can land Spark and DuckDB on opposite sides of the
# half-way point. Caught by the round-8 TPC-H-twin seed fuzz
# (seed 7: avg_monetary 2668914.1633 vs .1632); 2dp leaves 5e-3 of
# headroom. Recency/frequency are small-magnitude, 4dp is safe there.
#
# avg_monetary additionally averages EXACT INTEGER CENTS, not the 2dp
# doubles: a segment of n customers can put the TRUE average exactly on
# a half cent (total cents ≡ n*50 mod n*100), where summation order —
# not magnitude — decides the rounding side. From an exact integer sum
# both engines perform the same exactly-rounded IEEE divisions and land
# on the identical double. Caught by the round-8 streaming-RFM twin
# equality test (segment (3,1,2): 2058392.36 vs .37).

RFM_ORACLE = """
WITH maxd AS (SELECT MAX(o_orderdate) AS d FROM orders),
rfm AS (
    SELECT o_custkey,
           date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                     CAST((SELECT d FROM maxd) AS DATE)) AS recency,
           COUNT(*) AS frequency,
           ROUND(SUM(o_totalprice), 2) AS monetary
    FROM orders GROUP BY o_custkey
), cuts AS (
    SELECT [ROUND(c, 4) FOR c IN quantile_cont(recency, [0.25, 0.5, 0.75])] AS rc,
           [ROUND(c, 4) FOR c IN quantile_cont(frequency, [0.25, 0.5, 0.75])] AS fc,
           [ROUND(c, 2) FOR c IN quantile_cont(monetary, [0.25, 0.5, 0.75])] AS mc
    FROM rfm
), coded AS (
    SELECT CAST(len(list_filter(cuts.rc, c -> r.recency > c)) + 1 AS INT) AS r_code,
           CAST(len(list_filter(cuts.fc, c -> r.frequency > c)) + 1 AS INT) AS f_code,
           CAST(len(list_filter(cuts.mc, c -> r.monetary > c)) + 1 AS INT) AS m_code,
           r.recency AS recency, r.monetary AS monetary
    FROM rfm r, cuts
)
SELECT r_code, f_code, m_code,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(AVG(recency), 4) AS avg_recency_days,
       ROUND(CAST(SUM(CAST(ROUND(monetary * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0, 2) AS avg_monetary
FROM coded GROUP BY r_code, f_code, m_code
"""


@register("stats_rfm_segments", oracle=RFM_ORACLE, tags=("stats", "analytics"))
def stats_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days since last order, vs the corpus
    max date), frequency (order count), monetary (total spend, cents) per
    customer; each dimension quartile-coded 1..4 via exact percentile
    cut points (code = cuts strictly below + 1, so code 1 = most recent
    / least frequent / lowest spend quartile); segments rolled up.

    Scale shape: one per-customer aggregate (the only fact shuffle), a
    1-row max-date broadcast, a 1-row cut-point broadcast, and a
    <=64-row segment rollup. No ntile window anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("maxd"))
    rfm = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            round_to(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            F.datediff(F.col("maxd").cast("date"), F.col("last_order").cast("date"))
            .cast("long")
            .alias("recency"),
            "frequency",
            "monetary",
        )
    )
    qs = [0.25, 0.5, 0.75]
    qarr = F.array(*[F.lit(q) for q in qs])
    cuts = rfm.agg(
        F.transform(F.percentile("recency", qarr), lambda c: round_to(c, 4)).alias("rc"),
        F.transform(F.percentile("frequency", qarr), lambda c: round_to(c, 4)).alias("fc"),
        F.transform(F.percentile("monetary", qarr), lambda c: round_to(c, 2)).alias("mc"),
    )
    code = lambda cs, v: (  # noqa: E731 — local expression builder
        F.size(F.filter(cs, lambda c: v > c)) + F.lit(1)
    ).cast("int")
    coded = rfm.crossJoin(F.broadcast(cuts)).select(
        code(F.col("rc"), F.col("recency")).alias("r_code"),
        code(F.col("fc"), F.col("frequency")).alias("f_code"),
        code(F.col("mc"), F.col("monetary")).alias("m_code"),
        "recency",
        "monetary",
    )
    return coded.groupBy("r_code", "f_code", "m_code").agg(
        F.count(F.lit(1)).alias("n_customers"),
        round_to(F.avg("recency"), 4).alias("avg_recency_days"),
        round_to(
            F.sum(F.round(F.col("monetary") * 100).cast("long")).cast("double")
            / F.count(F.lit(1))
            / F.lit(100.0),
            2,
        ).alias("avg_monetary"),
    )


# --------------------------------------------------------------------------
# KMV distinct-count sketch (round 8) — the ORACLED approximate-distinct
# --------------------------------------------------------------------------
#
# HLL (agg_hll_sketch_merge) is the classic mergeable distinct sketch but
# its estimates are implementation-internal — rows-only forever. KMV
# (k-minimum-values / bottom-k) gives the same mergeable-sketch pattern
# with a FULLY deterministic, engine-neutral estimate: hash every
# distinct key with xxhash64, keep the k smallest normalized hashes per
# group, estimate distinct = (k-1) / max(kth smallest u). The sketch is
# just k doubles — union-merge = concat + re-top-k — and since round 8
# the oracle can replay Spark's xxhash64 in pure SQL, so the estimator
# hash-matches DuckDB end to end.
#
# Scale shape: distinct -> per-group bottom-k via a rank window (Spark
# plans WindowGroupLimit: partial top-k before the shuffle) -> one tiny
# per-group aggregate. The merged '__all__' row demonstrates sketch
# merging: the global bottom-k is the bottom-k of the per-group unions.
#
# Float parity: u = h_signed / 2^64 + 0.5 — an exactly-rounded division
# by a power of two of identical integers, so both engines hold
# bit-identical u; MAX and (k-1)/u are then deterministic (rounded 4dp
# only for display stability).

_KMV_K = 64


def _kmv_oracle() -> str:
    from data_pipeline_with_spark_kafka_spark.queries.xxh64_sql import (
        long_hash_wrap,
        to_signed,
        to_unsigned,
    )

    hash_sql, hcol = long_hash_wrap(
        "SELECT DISTINCT l_returnflag, " + to_unsigned("l_partkey") + " AS vu, l_partkey"
        " FROM lineitem",
        "vu",
    )
    return f"""
WITH hashed AS MATERIALIZED (
    SELECT l_returnflag, l_partkey,
           CAST({to_signed(hcol)} AS DOUBLE) / 18446744073709551616.0 + 0.5 AS u
    FROM ({hash_sql}) hz
), unioned AS (
    SELECT l_returnflag, l_partkey, u FROM hashed
    UNION ALL
    -- sketch merge = SET union of hash values (dedupe before re-top-k:
    -- a key present in several groups must count once globally)
    SELECT DISTINCT '__all__' AS l_returnflag, l_partkey, u FROM hashed
), bottomk AS (
    SELECT l_returnflag, u FROM unioned
    QUALIFY row_number() OVER (
        PARTITION BY l_returnflag ORDER BY u, l_partkey
    ) <= {_KMV_K}
)
SELECT l_returnflag AS scope,
       CAST(COUNT(*) AS BIGINT) AS sketch_size,
       -- a sketch that never filled (fewer than k distinct keys) IS the
       -- exact distinct set: the standard KMV estimate in that regime is
       -- the sketch size, not (k-1)/max(u) (round-8 advice)
       ROUND(CASE WHEN COUNT(*) < {_KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE ({_KMV_K} - 1) / MAX(u) END, 4) AS kmv_distinct_est
FROM bottomk GROUP BY l_returnflag
"""


@register("agg_kmv_distinct", oracle=_kmv_oracle(), tags=("agg", "sketch", "scale"))
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k distinct-count sketch per l_returnflag plus the
    MERGED '__all__' sketch — the cross-engine-verifiable alternative to
    HLL: deterministic xxhash64 normalization, per-group bottom-k via a
    rank window (WindowGroupLimit partial top-k), estimate =
    (k-1)/max(u). FULLY ORACLED from birth via the pure-SQL XXH64
    (queries/xxh64_sql.py hashLong path)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    hashed = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .select(
            "l_returnflag",
            "l_partkey",
            (F.xxhash64("l_partkey").cast("double") / F.lit(float(2**64)) + F.lit(0.5)).alias("u"),
        )
    )
    # sketch merge = SET union of hash values: dedupe keys across groups
    # before the global re-top-k, else a key in several groups counts
    # multiply and the merged estimate tracks (group, key) pairs.
    unioned = hashed.unionByName(
        hashed.select(F.lit("__all__").alias("l_returnflag"), "l_partkey", "u").distinct()
    )
    w = Window.partitionBy("l_returnflag").orderBy("u", "l_partkey")
    bottomk = (
        unioned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= _KMV_K)
    )
    # Unfilled sketch (< k distinct keys) is the exact distinct set — the
    # standard KMV estimate there is the sketch size itself (round-8
    # advice); mirrored in the oracle above.
    est = F.when(
        F.count(F.lit(1)) < F.lit(_KMV_K), F.count(F.lit(1)).cast("double")
    ).otherwise(F.lit(float(_KMV_K - 1)) / F.max("u"))
    return bottomk.groupBy(F.col("l_returnflag").alias("scope")).agg(
        F.count(F.lit(1)).alias("sketch_size"),
        round_to(est, 4).alias("kmv_distinct_est"),
    )


# --------------------------------------------------------------------------
# Inter-rater agreement: Cohen's kappa (round 8)
# --------------------------------------------------------------------------
#
# The distillation loop's health metric: how far does the CHEAP quality
# heuristic (operators/text.quality_score >= 0.5) agree with the
# EXPENSIVE Gopher rule stack beyond chance? Raw accuracy flatters
# imbalanced labels; kappa = (po - pe) / (1 - pe) corrects for the
# marginal agreement two raters get for free. All terms derive from the
# four integer confusion-cell counts, so the doubles are deterministic
# on both engines (exactly-rounded divisions of exact integers).

COHEN_KAPPA_ORACLE = """
WITH toks AS (
    SELECT doc_id, text, string_split(text, ' ') AS t
    FROM documents WHERE text IS NOT NULL
), flags AS (
    SELECT g.passes AS a,
           ROUND(0.4 * LEAST(len(tk.t) / 50.0, 1.0)
                 + 0.3 * (1.0 - len(list_filter(tk.t,
                       x -> list_contains(['the', 'a', 'of', 'and', 'to'], x))) * 1.0 / len(tk.t))
                 + 0.3 * LEAST(((length(tk.text) - (len(tk.t) - 1)) * 1.0 / len(tk.t)) / 8.0, 1.0),
                 4) >= 0.5 AS b
    FROM ({GOPHER}) g JOIN toks tk ON tk.doc_id = g.doc_id
), cells AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS tt,
           CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS tf,
           CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS ft,
           CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS ff
    FROM flags
)
SELECT n, tt AS n_both_pass, ff AS n_both_fail,
       ROUND((tt + ff) * 1.0 / n, 6) AS po,
       ROUND(((tt + tf) * 1.0 / n) * ((tt + ft) * 1.0 / n)
             + ((ft + ff) * 1.0 / n) * ((tf + ff) * 1.0 / n), 6) AS pe,
       ROUND(((tt + ff) * 1.0 / n
              - (((tt + tf) * 1.0 / n) * ((tt + ft) * 1.0 / n)
                 + ((ft + ff) * 1.0 / n) * ((tf + ff) * 1.0 / n)))
             / NULLIF(1.0 - (((tt + tf) * 1.0 / n) * ((tt + ft) * 1.0 / n)
                 + ((ft + ff) * 1.0 / n) * ((tf + ff) * 1.0 / n)), 0.0), 6) AS kappa
FROM cells
"""


def _kappa_oracle() -> str:
    from data_pipeline_with_spark_kafka_spark.queries.text_extra import GOPHER_ORACLE

    return COHEN_KAPPA_ORACLE.replace("{GOPHER}", GOPHER_ORACLE)


@register("stats_cohen_kappa", oracle=_kappa_oracle(), tags=("stats", "quality"))
def stats_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the Gopher rule stack and the cheap quality
    heuristic (score >= 0.5) — chance-corrected agreement for the
    distillation loop (raw accuracy flatters imbalanced labels; kappa=0
    means the cheap gate adds nothing over the base rate). One
    confusion-cell aggregate; every downstream term is a deterministic
    function of the four integer cells."""
    from data_pipeline_with_spark_kafka_spark.operators.text import quality_score, tokens
    from data_pipeline_with_spark_kafka_spark.queries.text_extra import llm_quality_gopher

    docs = load_table_fanned(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cheap = docs.select(
        "doc_id", (quality_score(F.col("text"), tokens(F.col("text"))) >= 0.5).alias("b")
    )
    g = llm_quality_gopher(spark, sf_dir).select("doc_id", F.col("passes").alias("a"))
    flags = g.join(cheap, "doc_id")
    cells = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("a") & F.col("b")).cast("long")).alias("tt"),
        F.sum((F.col("a") & ~F.col("b")).cast("long")).alias("tf"),
        F.sum((~F.col("a") & F.col("b")).cast("long")).alias("ft"),
        F.sum((~F.col("a") & ~F.col("b")).cast("long")).alias("ff"),
    )
    n, tt, tf, ft, ff = (F.col(c) for c in ("n", "tt", "tf", "ft", "ff"))
    po = (tt + ff) * 1.0 / n
    pe = ((tt + tf) * 1.0 / n) * ((tt + ft) * 1.0 / n) + ((ft + ff) * 1.0 / n) * (
        (tf + ff) * 1.0 / n
    )
    return cells.select(
        "n",
        tt.alias("n_both_pass"),
        ff.alias("n_both_fail"),
        round_to(po, 6).alias("po"),
        round_to(pe, 6).alias("pe"),
        round_to((po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0)), 6).alias("kappa"),
    )


# --------------------------------------------------------------------------
# KMV quantile sketch (round 8) — deterministic mergeable quantiles
# --------------------------------------------------------------------------
#
# The quantile companion to agg_kmv_distinct: a bottom-k-by-hash sample
# is a fixed-size, MERGEABLE, deterministic uniform sample (merge = set
# union + re-top-k, exactly the KMV sketch), so quantiles computed from
# it are a deterministic approximate-quantile sketch — unlike
# percentile_approx's GK sketch, whose internals are engine-specific
# (agg_approx_percentile stays rows-only). The estimate is the exact
# interpolated percentile OF THE SAMPLE, mirrored verbatim in DuckDB.

_KMVQ_K = 128


def _kmv_quantile_oracle() -> str:
    from data_pipeline_with_spark_kafka_spark.queries.xxh64_sql import (
        long_hash_wrap,
        to_signed,
        to_unsigned,
    )

    hash_sql, hcol = long_hash_wrap(
        "SELECT o_orderkey, " + to_unsigned("o_orderkey") + " AS vu, o_totalprice"
        " FROM orders",
        "vu",
    )
    return f"""
WITH hashed AS MATERIALIZED (
    SELECT o_orderkey, o_totalprice, {to_signed(hcol)} AS h
    FROM ({hash_sql}) hz
), sample AS (
    SELECT o_totalprice FROM hashed
    QUALIFY row_number() OVER (ORDER BY h, o_orderkey) <= {_KMVQ_K}
)
SELECT CAST(COUNT(*) AS BIGINT) AS sample_n,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_est,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_est,
       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99_est
FROM sample
"""


@register("agg_kmv_quantiles", oracle=_kmv_quantile_oracle(), tags=("agg", "sketch", "scale"))
def agg_kmv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch: order-total percentiles
    estimated from the bottom-{k}-by-xxhash64 sample of orders — the
    engine-neutral alternative to percentile_approx's GK sketch
    (rows-only forever). The sample is a fixed-size uniform draw whose
    membership is a pure function of the keys, so merging shards is set
    union + re-top-k and both engines hold the identical sample;
    quantile interpolation then runs on identical doubles. Bottom-k
    plans as one TakeOrdered-style limit, never a global sort of the
    fact table."""
    orders = load_table(spark, sf_dir, "orders")
    sample = (
        orders.select(
            F.xxhash64("o_orderkey").alias("h"), "o_orderkey", "o_totalprice"
        )
        .orderBy("h", "o_orderkey")
        .limit(_KMVQ_K)
    )
    return sample.agg(
        F.count(F.lit(1)).alias("sample_n"),
        *[
            round_to(F.percentile("o_totalprice", F.lit(p)), 4).alias(name)
            for p, name in [(0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")]
        ],
    )
