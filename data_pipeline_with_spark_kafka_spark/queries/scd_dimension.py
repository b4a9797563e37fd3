"""SCD type-2 dimension maintenance as a registered query (operator:
operators/scd.py).

The update batch is derived deterministically from the customer table
itself so both engines build the identical fixture:
- keys % 10 == 0  -> account balance bumped by 100 (a real change);
- keys % 10 == 5  -> resent unchanged (a no-op update the merge must
  NOT version);
- keys % 97 == 0  -> re-keyed +1_000_000 (brand-new inserts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.operators.scd import scd2_apply
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

SCD2_CUSTOMER_ORACLE = """
WITH cur AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         TIMESTAMP '1992-01-01 00:00:00' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer
), upd AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 5
  UNION ALL
  SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 97 = 0
), changed AS (
  SELECT u.* FROM upd u JOIN cur c USING (c_custkey)
  WHERE u.c_name IS DISTINCT FROM c.c_name
     OR u.c_acctbal IS DISTINCT FROM c.c_acctbal
     OR u.c_mktsegment IS DISTINCT FROM c.c_mktsegment
), inserted AS (
  SELECT u.* FROM upd u
  WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.c_custkey = u.c_custkey)
)
SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment, c.valid_from,
       CASE WHEN ch.c_custkey IS NOT NULL THEN TIMESTAMP '1998-01-01 00:00:00'
            ELSE c.valid_to END AS valid_to,
       ch.c_custkey IS NULL AS is_current
FROM cur c LEFT JOIN changed ch USING (c_custkey)
UNION ALL
SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
       TIMESTAMP '1998-01-01 00:00:00' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
FROM (SELECT * FROM changed UNION ALL SELECT * FROM inserted)
"""


@register("scd2_customer_batch", oracle=SCD2_CUSTOMER_ORACLE, tags=("merge", "dimension"))
def scd2_customer_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 merge of a derived update batch into the customer
    dimension: changed keys are closed + re-opened, no-op updates keep
    their original row, unseen keys insert. One full-outer key join."""
    customer = load_table(spark, sf_dir, "customer")
    attrs = ["c_name", "c_acctbal", "c_mktsegment"]
    snapshot = customer.select(
        "c_custkey",
        *attrs,
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    key = F.col("c_custkey")
    updates = (
        customer.filter(key % 10 == 0)
        .select("c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("c_acctbal"), "c_mktsegment")
        .unionByName(customer.filter(key % 10 == 5).select("c_custkey", *attrs))
        .unionByName(
            customer.filter(key % 97 == 0)
            .select((key + 1_000_000).alias("c_custkey"), *attrs)
        )
    )
    return scd2_apply(
        snapshot, updates, "c_custkey", attrs, F.lit("1998-01-01").cast("timestamp")
    )


CDC_APPLY_ORACLE = """
WITH chg AS (
  SELECT c_custkey, c_name, c_acctbal + 50.0 AS c_acctbal, c_mktsegment,
         'U' AS op, 1 AS seq FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal + 100.0, c_mktsegment, 'U', 2
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
         CAST(NULL AS VARCHAR), 'D', 3
  FROM customer WHERE c_custkey % 13 = 0
  UNION ALL
  SELECT c_custkey + 2000000, c_name, c_acctbal, c_mktsegment, 'I', 1
  FROM customer WHERE c_custkey % 89 = 0
), latest AS (
  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                              ORDER BY seq DESC) AS rn
                 FROM chg)
  WHERE rn = 1
)
SELECT COALESCE(l.c_custkey, s.c_custkey) AS c_custkey,
       CASE WHEN l.op IS NOT NULL THEN l.c_name ELSE s.c_name END AS c_name,
       CASE WHEN l.op IS NOT NULL THEN l.c_acctbal ELSE s.c_acctbal END AS c_acctbal,
       CASE WHEN l.op IS NOT NULL THEN l.c_mktsegment ELSE s.c_mktsegment END AS c_mktsegment
FROM customer s FULL OUTER JOIN latest l ON s.c_custkey = l.c_custkey
WHERE l.op IS NULL OR l.op <> 'D'
"""


@register("cdc_apply_customer", oracle=CDC_APPLY_ORACLE, tags=("merge", "cdc"))
def cdc_apply_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a derived I/U/D change feed (with per-key history that
    must compact to the latest event: two stacked updates, a delete
    that wins over earlier updates on overlap keys) to the customer
    snapshot. One feed window + one full-outer key join."""
    customer = load_table(spark, sf_dir, "customer")
    attrs = ["c_name", "c_acctbal", "c_mktsegment"]
    key = F.col("c_custkey")

    def branch(pred, name, bal, seg, op, seq):
        return customer.filter(pred).select(
            (key + (2_000_000 if op == "I" else 0)).alias("c_custkey"),
            name.alias("c_name"),
            bal.alias("c_acctbal"),
            seg.alias("c_mktsegment"),
            F.lit(op).alias("op"),
            F.lit(seq).alias("seq"),
        )

    name, bal, seg = F.col("c_name"), F.col("c_acctbal"), F.col("c_mktsegment")
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    changes = (
        branch(key % 10 == 0, name, bal + 50.0, seg, "U", 1)
        .unionByName(branch(key % 10 == 0, name, bal + 100.0, seg, "U", 2))
        .unionByName(branch(key % 13 == 0, null_s, null_d, null_s, "D", 3))
        .unionByName(branch(key % 89 == 0, name, bal, seg, "I", 1))
    )
    from data_pipeline_with_spark_kafka_spark.operators.scd import cdc_apply

    return cdc_apply(
        customer.select("c_custkey", *attrs), changes, "c_custkey", attrs, seq_col="seq"
    )


SCD2_TEMPORAL_JOIN_ORACLE = """
WITH cur AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         TIMESTAMP '1992-01-01 00:00:00' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer
), upd AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
), changed AS (
  SELECT u.* FROM upd u JOIN cur c USING (c_custkey)
  WHERE u.c_acctbal IS DISTINCT FROM c.c_acctbal
), dim AS (
  SELECT c.c_custkey, c.c_acctbal, c.valid_from,
         CASE WHEN ch.c_custkey IS NOT NULL THEN TIMESTAMP '1996-01-01 00:00:00'
              ELSE c.valid_to END AS valid_to
  FROM cur c LEFT JOIN changed ch USING (c_custkey)
  UNION ALL
  SELECT c_custkey, c_acctbal, TIMESTAMP '1996-01-01 00:00:00', CAST(NULL AS TIMESTAMP)
  FROM changed
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       d.c_acctbal AS acctbal_at_order_time,
       d.valid_from AS version_valid_from
FROM orders o JOIN dim d
  ON o.o_custkey = d.c_custkey
 AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
 AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to)
"""


@register("scd2_temporal_join", oracle=SCD2_TEMPORAL_JOIN_ORACLE, tags=("merge", "join", "dimension"))
def scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumption side of type-2 history: join each order to the
    dimension VERSION that was valid on its order date (equi-join on
    the key + validity-interval residual — per-key version counts are
    tiny, so the residual filters a handful of rows per match; no range
    explosion needed). The versioned dim is built in-query with the
    same derivation the oracle uses (balance bump for keys % 10 == 0,
    effective 1996-01-01), so each engine constructs an identical
    2-version history for 10% of customers."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    attrs = ["c_name", "c_acctbal", "c_mktsegment"]
    snapshot = customer.select(
        "c_custkey",
        *attrs,
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = customer.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    dim = scd2_apply(
        snapshot, updates, "c_custkey", attrs, F.lit("1996-01-01").cast("timestamp")
    ).select("c_custkey", "c_acctbal", "valid_from", "valid_to")
    od = F.col("o_orderdate").cast("timestamp")
    return (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .filter(
            (od >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (od < F.col("valid_to")))
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("c_acctbal").alias("acctbal_at_order_time"),
            F.col("valid_from").alias("version_valid_from"),
        )
    )


CDC_DERIVE_ORACLE = """
WITH olds AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
), news AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 10 = 3 THEN c_acctbal + 50.0 ELSE c_acctbal END
             AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + 2000000, c_name, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 89 = 0
)
SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'I'
            WHEN n.c_custkey IS NULL THEN 'D'
            ELSE 'U' END AS op,
       n.c_name, n.c_acctbal, n.c_mktsegment
FROM olds o FULL JOIN news n ON o.c_custkey = n.c_custkey
WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
   OR o.c_name IS DISTINCT FROM n.c_name
   OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
   OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
"""


@register("cdc_derive_changes", oracle=CDC_DERIVE_ORACLE, tags=("merge", "dimension", "cdc"))
def cdc_derive_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing — derive the I/U/D change feed that turns
    one full dimension dump into the next (operators/scd.derive_changes,
    the inverse of cdc_apply; round-trip law property-tested in
    tests/test_scd.py). The new snapshot is built deterministically from
    customer: keys % 13 == 0 dropped (deletes), % 10 == 3 rebalanced
    (updates), % 89 == 0 re-keyed +2M (inserts). One full-outer key
    join; unchanged keys leave the feed."""
    from data_pipeline_with_spark_kafka_spark.operators.scd import derive_changes

    customer = load_table(spark, sf_dir, "customer")
    attrs = ["c_name", "c_acctbal", "c_mktsegment"]
    old = customer.select("c_custkey", *attrs)
    new = (
        customer.filter(F.col("c_custkey") % 13 != 0)
        .select(
            "c_custkey",
            "c_name",
            F.when(F.col("c_custkey") % 10 == 3, F.col("c_acctbal") + 50.0)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            "c_mktsegment",
        )
        .unionByName(
            customer.filter(F.col("c_custkey") % 89 == 0).select(
                (F.col("c_custkey") + 2000000).alias("c_custkey"), *attrs
            )
        )
    )
    return derive_changes(old, new, "c_custkey", attrs)
