"""Scalar-function corpus: string / date / math / conditional / cast / json /
array / higher-order / explode families (SURVEY.md §2.7 [EXT]).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; zero Python UDFs. Each family is one narrow query so a
failure localizes to the family.

Oracle-parity gotchas handled here:
- Spark ``datediff(end, start)`` == DuckDB ``datediff('day', start, end)``;
- Spark arrays are 1-indexed via ``element_at`` (matches DuckDB lists);
- float elements are cast to double BEFORE arithmetic on both sides;
- regexp patterns restricted to the common Java/RE2 subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table, load_table_fanned
from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to


@register(
    "func_string_family",
    oracle="""
SELECT p_partkey,
       LOWER(p_type) AS type_lower,
       UPPER(p_name) AS name_upper,
       SUBSTRING(p_name, 1, 5) AS name_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       string_split(p_name, ' ')[1] AS first_word,
       REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
       REPLACE(p_name, ' ', '_') AS name_snake,
       -- '||' not CONCAT: DuckDB's CONCAT treats NULL args as '' (would
       -- yield '' where Spark's concat propagates NULL); '||' propagates.
       TRIM(' ' || p_name || ' ') AS name_trimmed,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       CONTAINS(p_name, 'widget') AS is_widget,
       STARTS_WITH(p_type, 'PROMO') AS is_promo
FROM part
""",
    tags=("functions", "string"),
)
def func_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/substring/length/concat_ws/split/regexp_extract/replace/
    trim/lpad/contains/startswith."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_type").alias("type_lower"),
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.col("p_name").contains("widget").alias("is_widget"),
        F.col("p_type").startswith("PROMO").alias("is_promo"),
    )


@register(
    "func_date_family",
    oracle="""
SELECT o_orderkey,
       EXTRACT(YEAR FROM o_orderdate) AS order_year,
       EXTRACT(MONTH FROM o_orderdate) AS order_month,
       EXTRACT(DAY FROM o_orderdate) AS order_day,
       EXTRACT(QUARTER FROM o_orderdate) AS order_quarter,
       EXTRACT(DOW FROM o_orderdate) AS order_dow,
       date_trunc('month', o_orderdate) AS month_start,
       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
       o_orderdate + INTERVAL 3 MONTH AS plus_3_months,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       strftime(o_orderdate, '%Y-%m') AS year_month,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date_only
FROM orders
""",
    tags=("functions", "date"),
)
def func_date_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/dayofweek/date_trunc/datediff/add_months/
    last_day/date_format/cast-to-date.

    Spark ``dayofweek`` is 1=Sunday..7=Saturday; DuckDB ``EXTRACT(DOW)`` is
    0=Sunday..6 — offset by -1 on the Spark side to align.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus_3_months"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.col("o_orderdate").cast("date").cast("timestamp").alias("order_date_only"),
    )


@register(
    "func_math_family",
    oracle="""
SELECT c_custkey,
       ROUND(c_acctbal, 2) AS bal_round,
       ABS(c_acctbal) AS bal_abs,
       CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
       CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
       ROUND(SQRT(ABS(c_acctbal)), 4) AS bal_sqrt,
       ROUND(LN(ABS(c_acctbal) + 1), 4) AS bal_ln,
       ROUND(LOG10(ABS(c_acctbal) + 1), 4) AS bal_log10,
       ROUND(POW(c_acctbal / 1000, 2), 4) AS bal_pow,
       c_custkey % 7 AS key_mod,
       CAST(SIGN(c_acctbal) AS DOUBLE) AS bal_sign,
       GREATEST(c_acctbal, 0.0) AS bal_pos,
       LEAST(c_acctbal, 0.0) AS bal_neg
FROM customer
""",
    tags=("functions", "math"),
)
def func_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/log10/pow/mod/sign/greatest/least."""
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        round_to(bal, 2).alias("bal_round"),
        F.abs(bal).alias("bal_abs"),
        F.ceil(bal).alias("bal_ceil"),
        F.floor(bal).alias("bal_floor"),
        round_to(F.sqrt(F.abs(bal)), 4).alias("bal_sqrt"),
        round_to(F.log(F.abs(bal) + 1), 4).alias("bal_ln"),
        round_to(F.log10(F.abs(bal) + 1), 4).alias("bal_log10"),
        round_to(F.pow(bal / 1000, 2), 4).alias("bal_pow"),
        (F.col("c_custkey") % 7).alias("key_mod"),
        F.signum(bal).alias("bal_sign"),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(0.0)).alias("bal_neg"),
    )


@register(
    "func_conditional_family",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 250000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_tier,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_display,
       -- bare IN (no CASE wrapper): NULL priority -> NULL is_urgent on
       -- both engines; a CASE ... ELSE FALSE would coerce SQL's
       -- three-valued unknown to FALSE where Spark's isin keeps NULL
       -- (round-8 all-NULL edge corpus).
       o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent,
       IF(o_orderstatus = 'O', 1, 0) AS open_flag
FROM orders
""",
    tags=("functions", "conditional"),
)
def func_conditional_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chains, coalesce/nullif, IN-list, if/else."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 250000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_display"
        ),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_urgent"),
        F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("open_flag"),
    )


@register(
    "func_cast_family",
    oracle="""
SELECT l_orderkey,
       CAST(l_quantity AS INTEGER) AS qty_int,
       CAST(l_quantity AS VARCHAR) AS qty_str,
       CAST(CAST(l_extendedprice AS DECIMAL(18, 2)) AS DOUBLE) AS price_decimal,
       CAST(l_linenumber AS BIGINT) AS line_big,
       CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date,
       CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch,
       CAST(l_returnflag = 'R' AS INTEGER) AS returned_int
FROM lineitem
""",
    tags=("functions", "cast"),
)
def func_cast_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric/string/decimal/date/epoch/boolean casts.

    ``l_quantity`` is integral-valued so double->int is exact on both
    engines; double literal decimals cast with identical HALF_UP rounding
    at 2 digits for these 2-decimal source values.

    ``price_decimal`` exercises the DECIMAL(18,2) cast but is re-cast to
    DOUBLE at the boundary: Spark renders decimals with trailing zeros
    ('96262.50') while the DuckDB oracle arrives as a float ('96262.5'),
    which hash-mismatches under the driver canon despite equal values.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_decimal"),
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("ship_date"),
        F.unix_timestamp("l_shipdate").alias("ship_epoch"),
        (F.col("l_returnflag") == "R").cast("int").alias("returned_int"),
    )


@register(
    "func_json_family",
    oracle="""
SELECT event_id,
       -- json_extract_string RAISES on malformed JSON in DuckDB (Spark's
       -- get_json_object returns NULL) — guard every extraction so the
       -- oracle never crashes on a corpus with garbage props. Spark's
       -- from_json('k INT') is STRICT: only JSON integer literals parse
       -- (quoted "12", 12.7, true all -> NULL), so gate on the path's
       -- JSON type; TRY_CAST mirrors overflow -> NULL.
       CASE WHEN json_valid(props)
                 AND json_type(CAST(props AS JSON), '$.k') IN ('UBIGINT', 'BIGINT')
            THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) END AS k_value,
       CASE WHEN json_valid(props)
            THEN json_extract_string(props, '$.missing') END AS missing_value,
       CASE WHEN props IS NULL THEN NULL
            WHEN json_valid(props) THEN json_type(CAST(props AS JSON)) = 'OBJECT'
            ELSE false END AS is_json_object
FROM events
""",
    tags=("functions", "json"),
)
def func_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json over the events.props JSON column
    (the reference's Kafka-payload parse, ``spark_consumer_kafka.py:66``).

    The validity flag is IS-JSON-OBJECT on both engines, with NULL props
    propagating NULL (the round-7 seed fuzz caught the NULL edge; the
    round-7 code review caught the rest: PERMISSIVE from_json(struct)
    returns a non-null all-null-fields struct even for garbage input, so
    the old from_json(...).isNotNull() form was TRUE for '123', '[1]'
    and 'not json' where json_valid is false — invisible on corpora
    whose props are always well-formed objects or NULL, i.e. every
    fixture so far). from_json(MAP<STRING,STRING>) is the Spark
    expression with exact object semantics: NULL for invalid JSON and
    for valid non-object JSON, non-null for any object (nested values
    stringify), verified cell-for-cell against DuckDB's
    json_valid + json_type = 'OBJECT' across the edge matrix.

    Fanned scan (round 13 — the carried r12 "untested" item, now
    measured): per-row JSON parsing is exactly the map-heavy shape the
    small-scan fan-out exists for — interleaved A/B med 0.87 -> 0.40 s,
    min 0.73 -> 0.27 s at sf0.1. Pure map, no layout-dependent draws."""
    events = load_table_fanned(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k_value"),
        F.get_json_object("props", "$.missing").alias("missing_value"),
        F.when(F.col("props").isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.from_json("props", "MAP<STRING,STRING>").isNotNull())
        .alias("is_json_object"),
    )


@register(
    "func_array_family",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
       ROUND(CAST(embedding[64] AS DOUBLE), 4) AS last_elem,
       ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS elem_sum,
       ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sum_squares,
       ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS elem_max,
       len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
""",
    tags=("functions", "array", "higher-order"),
)
def func_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at + higher-order transform/aggregate/filter over
    array<float> — the JVM-side (codegen) path for embedding math."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        round_to(F.element_at("embedding", 1).cast("double"), 4).alias("first_elem"),
        round_to(F.element_at("embedding", 64).cast("double"), 4).alias("last_elem"),
        round_to(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("elem_sum"),
        round_to(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sum_squares"),
        round_to(F.array_max(as_double), 4).alias("elem_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "func_explode_tokens",
    oracle="""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
""",
    tags=("functions", "explode", "text"),
)
def func_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(...)) + group-count + deterministic top-20 terms."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "func_struct_map_family",
    oracle="""
SELECT doc_id,
       to_json({'lang': lang, 'source': source}) AS meta_json,
       MAP(['lang','source'],[lang,source])['lang'][1] AS lang_from_map,
       CONCAT_WS(':', lang, source) AS lang_source
FROM documents
""",
    tags=("functions", "struct", "map"),
)
def func_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct construction (serialized to JSON — raw struct cells normalize
    differently across engine->pandas paths) + map construction/extraction.

    NULL-edge alignment (round-8 all-NULL corpus): to_json keeps null
    fields (Spark's default silently DROPS them — '{}' vs DuckDB's
    '{"lang":null,...}'), and the oracle uses CONCAT_WS (skip-null +
    skip-separator, Spark's concat_ws semantics) rather than CONCAT
    (DuckDB treats NULL as '' and keeps the ':')."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.to_json(
            F.struct(F.col("lang"), F.col("source")),
            {"ignoreNullFields": "false"},
        ).alias("meta_json"),
        F.element_at(
            F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")), "lang"
        ).alias("lang_from_map"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
    )
