"""Data-governance queries: k-anonymity audit and distribution drift.

Training-data pipelines ship with privacy and monitoring obligations:
- ``privacy_k_anonymity``: are there quasi-identifier combinations so
  rare they single people out? Classic k-anonymity over the
  (nation, segment) quasi-identifier pair: group sizes, flag groups
  below k, and report the suppression cost.
- ``drift_psi_labels``: population-stability-index drift between a
  reference and a current slice of the embeddings corpus — the number
  a model-quality dashboard alarms on when the ingest mix shifts.

Scale notes: both are one map-side-combinable aggregate over the fact
table plus joins between aggregate-sized relations (quasi-groups /
label distributions) — nothing corpus-sized shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

K_ANON = 20

K_ANONYMITY_ORACLE = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS group_size
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, group_size,
       group_size < {K_ANON} AS below_k,
       CASE WHEN group_size < {K_ANON} THEN group_size ELSE 0 END
         AS suppressed_rows
FROM g
"""


@register("privacy_k_anonymity", oracle=K_ANONYMITY_ORACLE, tags=("governance", "privacy"))
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the (nation, segment) quasi-identifier:
    per-group sizes, below-k flag, and the row count suppression would
    cost. One combinable aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    g = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    below = F.col("group_size") < K_ANON
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        below.alias("below_k"),
        F.when(below, F.col("group_size")).otherwise(F.lit(0)).cast("long").alias(
            "suppressed_rows"
        ),
    )


DRIFT_PSI_ORACLE = """
WITH ref AS (
  SELECT label, COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER () AS p
  FROM embeddings WHERE vec_id % 2 = 0 GROUP BY label
), cur AS (
  SELECT label, COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER () AS q
  FROM embeddings WHERE vec_id % 2 = 1 GROUP BY label
)
SELECT r.label, ROUND(r.p, 6) AS ref_share, ROUND(c.q, 6) AS cur_share,
       ROUND((c.q - r.p) * LN(c.q / r.p), 6) AS psi_term
FROM ref r JOIN cur c USING (label)
"""


@register("drift_psi_labels", oracle=DRIFT_PSI_ORACLE, tags=("governance", "monitoring"))
def drift_psi_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index terms per label between the even-id
    (reference) and odd-id (current) halves of the embeddings corpus.
    Two label-sized aggregates joined on label; the total PSI is the
    sum of psi_term downstream."""
    emb = load_table(spark, sf_dir, "embeddings")

    def share(pred, name):
        counts = emb.filter(pred).groupBy("label").agg(F.count(F.lit(1)).alias("n"))
        # global-total window over the LABEL-SIZED aggregate (10 rows),
        # not over the corpus — the single partition is fine there.
        total = F.sum("n").over(Window.partitionBy())
        return counts.select("label", (F.col("n") / total).alias(name))

    ref = share(F.col("vec_id") % 2 == 0, "p")
    cur = share(F.col("vec_id") % 2 == 1, "q")
    return ref.join(cur, "label").select(
        "label",
        round_to("p", 6).alias("ref_share"),
        round_to("q", 6).alias("cur_share"),
        round_to((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p")), 6).alias(
            "psi_term"
        ),
    )


# --------------------------------------------------------------------------
# GDPR right-to-erasure cascade (round 7)
# --------------------------------------------------------------------------
#
# The governance operation every large data platform actually runs: a
# small set of erasure requests (data subjects) must be propagated through
# every table that references them — directly (orders by customer key,
# events by user id) and transitively (lineitems of erased orders). The
# query is the AUDIT form: per-table would-be-erased and surviving counts,
# which is what a compliance report needs before the destructive rewrite.

_ERASURE_MOD = 97

ERASURE_CASCADE_ORACLE = f"""
WITH del_c AS (SELECT c_custkey FROM customer WHERE c_custkey % {_ERASURE_MOD} = 0),
del_o AS (
    SELECT o_orderkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM del_c)
)
SELECT table_name, rows_erased, rows_surviving FROM (
    SELECT 'customer' AS table_name,
           CAST((SELECT COUNT(*) FROM del_c) AS BIGINT) AS rows_erased,
           CAST((SELECT COUNT(*) FROM customer)
                - (SELECT COUNT(*) FROM del_c) AS BIGINT) AS rows_surviving
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM del_o),
           (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM del_o)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM del_o)),
           -- surviving = total - erased, NOT a NOT IN: a NULL key row
           -- must count as surviving (it matches no tombstone), and
           -- NOT IN drops it.
           (SELECT COUNT(*) FROM lineitem)
           - (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM del_o))
    UNION ALL
    SELECT 'events',
           (SELECT COUNT(*) FROM events
            WHERE user_id IN (SELECT c_custkey FROM del_c)),
           (SELECT COUNT(*) FROM events)
           - (SELECT COUNT(*) FROM events
              WHERE user_id IN (SELECT c_custkey FROM del_c))
) ORDER BY table_name
"""


@register(
    "privacy_erasure_cascade",
    oracle=ERASURE_CASCADE_ORACLE,
    tags=("governance", "privacy"),
)
def privacy_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure-request cascade audit: per-table erased/surviving row
    counts for a deterministic tombstone set (c_custkey % 97 == 0 stands
    in for the regulatory request list), propagated customer -> orders ->
    lineitem and customer -> events.

    Scale shape (100 TB): a real erasure-request list is external and
    tiny, but THIS query's deterministic stand-in (a modulus filter) is
    sf-PROPORTIONAL — so the joins carry no broadcast hints (the
    q22/q14 de-hinting contract, enforced by
    test_no_broadcast_hint_on_sf_scaled_table): stats + AQE elect the
    broadcast while the tombstone relation fits the threshold (it does
    at every test scale, plan-asserted) and fall back to shuffle
    semi/anti joins when a 1%-of-customers list no longer does. Either
    way each fact table is scanned exactly once into one combinable
    aggregate. The same plan with a .filter(~erased).write() tail is
    the destructive rewrite (run.py erase), where the CLI's
    --subject-ids list IS request-bounded and broadcasts by hint."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    tomb_c = customer.filter((F.col("c_custkey") % _ERASURE_MOD) == 0).select(
        F.col("c_custkey").alias("_tk")
    )
    tomb_o = (
        orders.join(tomb_c, orders["o_custkey"] == F.col("_tk"), "semi")
        .select(F.col("o_orderkey").alias("_tk"))
    )

    def leg(df: DataFrame, key: str, tomb: DataFrame, name: str) -> DataFrame:
        # Broadcast LEFT join against the (unique-keyed) tombstone set +
        # one combinable aggregate — one scan, no fact shuffle.
        # No broadcast hint (see docstring): the planner elects it while
        # the tombstone relation fits, and can demote at scale.
        j = df.join(tomb, df[key] == tomb["_tk"], "left")
        # coalesce(0): a zero-row fact table must report (0, 0) like the
        # oracle's COUNT(*) arithmetic, not (NULL, NULL) from sum-of-none.
        return j.agg(
            F.coalesce(
                F.sum(F.col("_tk").isNotNull().cast("long")), F.lit(0)
            ).alias("rows_erased"),
            F.coalesce(
                F.sum(F.col("_tk").isNull().cast("long")), F.lit(0)
            ).alias("rows_surviving"),
        ).select(F.lit(name).alias("table_name"), "rows_erased", "rows_surviving")

    out = (
        leg(customer, "c_custkey", tomb_c, "customer")
        .unionAll(leg(orders, "o_custkey", tomb_c, "orders"))
        .unionAll(leg(lineitem, "l_orderkey", tomb_o, "lineitem"))
        .unionAll(leg(events, "user_id", tomb_c, "events"))
    )
    return out.orderBy("table_name")
