"""Dataset splitting / shuffling / sampling for training-data pipelines.

The split and shuffle operators use content-hash bucketing (md5 — portable
across engines, so fully DuckDB-oracle-able) rather than RNG state:
hash-based splits are reproducible across runs, clusters, AND engines, and
survive repartitioning — the property that matters when a 100 TB corpus is
re-materialized and the val set must not leak into train. Seeded RNG
sampling (Spark's sample/sampleBy) is engine-specific -> rows-only +
pytest-property-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

SPLIT_ORACLE = """
WITH h AS (
    SELECT doc_id, lang,
           CAST(('0x' || SUBSTRING(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
    FROM documents
)
SELECT doc_id, lang,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM h
"""


@register("llm_train_val_test_split", oracle=SPLIT_ORACLE, tags=("llm", "sampling"))
def llm_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by md5 bucket of the document id —
    reproducible across engines and re-materializations (no RNG state)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split42:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return docs.select(
        "doc_id",
        "lang",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


SHUFFLE_ORACLE = """
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY md5('shuffle7:' || CAST(doc_id AS VARCHAR)), doc_id) AS shuffle_rank
FROM documents
"""


SHUFFLE_RANGE_PARTITIONS = 32


@register("llm_deterministic_shuffle", oracle=SHUFFLE_ORACLE, tags=("llm", "sampling"))
def llm_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random global ordering (training-epoch shuffle):
    rank by md5 of a seeded key. Changing the seed string reshuffles; the
    same seed always yields the same order, on any engine.

    Scale shape (NOT a global ``Window.orderBy`` — that funnels every row
    through one task): ``repartitionByRange`` on the shuffle key gives
    order-preserving range partitions; ranks are assigned per partition
    (``row_number`` over ``spark_partition_id``), then a tiny
    (#partitions)-row cumulative-offset relation is broadcast back and
    added. Total order is identical to the single-sort formulation — the
    DuckDB oracle checks it bit-for-bit — but the heavy sort is P parallel
    range sorts plus one broadcast join.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shuffle7:"), F.col("doc_id").cast("string")))
    ranged = (
        docs.select("doc_id", key.alias("_k"))
        .repartitionByRange(SHUFFLE_RANGE_PARTITIONS, F.col("_k"), F.col("doc_id"))
        .withColumn("_pid", F.spark_partition_id())
    )
    local = ranged.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy("_k", "doc_id"))
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select("doc_id", (F.col("_off") + F.col("_rn")).alias("shuffle_rank"))
    )


@register("llm_seeded_sample", oracle=None, tags=("llm", "sampling", "approx"))
def llm_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (engine-specific RNG -> rows-only; the
    determinism/fraction properties are pinned in tests/test_llm_ops.py).
    NOT fanned: RNG draws depend on the partition layout — the scan
    fan-out would change the sampled set."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.sample(fraction=0.2, seed=42).select("doc_id", "lang")


@register("llm_stratified_sample", oracle=None, tags=("llm", "sampling", "approx"))
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sample (sampleBy): downsample dominant
    languages, keep the rest — the standard corpus-rebalancing op.
    NOT fanned: sampleBy draws depend on the partition layout (see
    llm_seeded_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 0.5, "fr": 1.0, "es": 1.0, "zh": 1.0}
    return docs.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")


STRATIFIED_MD5_ORACLE = """
SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           ('0x' || substr(md5('strat1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u,
           CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.5
                     WHEN 'fr' THEN 1.0 WHEN 'es' THEN 1.0 WHEN 'zh' THEN 1.0
                     ELSE 0.0 END AS f
    FROM documents
) WHERE u < f
"""


@register(
    "llm_stratified_sample_md5",
    oracle=STRATIFIED_MD5_ORACLE,
    tags=("llm", "sampling"),
)
def llm_stratified_sample_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified Bernoulli sample with a DETERMINISTIC
    md5-derived uniform instead of Spark's RNG — the fully-oracled twin
    of ``llm_stratified_sample`` (same fraction map), completing the
    twin pattern: every Spark-RNG sampling query now has a cross-engine
    reproducible counterpart DuckDB replays exactly.

    Scale shape: a pure per-row expression filter — zero shuffles, and
    (unlike rand(seed), which changes with partitioning) the kept set is
    a pure function of doc_id: stable across repartitions, retries and
    engine versions, which is what an auditable corpus release needs."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat1:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    f = (
        F.when(F.col("lang").isin("en", "de"), F.lit(0.5))
        .when(F.col("lang").isin("fr", "es", "zh"), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    return docs.filter(u < f).select("doc_id", "lang")


WEIGHTED_RESERVOIR_K = 200

WEIGHTED_RESERVOIR_ORACLE = f"""
SELECT doc_id, source, n_chars, ROUND(pri, 6) AS priority
FROM (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
         POW(('0x' || substr(md5('wres1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0,
             1.0 / n_chars) AS pri
  FROM documents
)
ORDER BY pri DESC, doc_id
LIMIT {WEIGHTED_RESERVOIR_K}
"""


@register("llm_weighted_reservoir", oracle=WEIGHTED_RESERVOIR_ORACLE, tags=("llm", "sampling"))
def llm_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res):
    each doc gets priority u^(1/w) with u a DETERMINISTIC md5-derived
    uniform (cross-engine reproducible, unlike rand(seed)) and w its
    char mass; the global top-k by priority IS the weighted sample.

    Scale shape: one expression pass + TakeOrderedAndProject — each
    partition keeps a local top-k heap, the driver merges k-sized
    buffers. No global sort, no single-task window."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wres1:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    pri = F.pow(u, 1.0 / F.col("n_chars"))
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            pri.alias("pri"),
        )
        .orderBy(F.desc("pri"), "doc_id")
        .limit(WEIGHTED_RESERVOIR_K)
        .select("doc_id", "source", "n_chars", round_to("pri", 6).alias("priority"))
    )


# --------------------------------------------------------------------------
# Leakage-proof split: bucket by DEDUP CLUSTER, not by document
# --------------------------------------------------------------------------
#
# The eval-integrity trap a plain per-doc split falls into: two near-
# duplicates land on opposite sides of the train/test boundary and the
# benchmark leaks. The fix is to split by the near-dup CLUSTER id (the
# connected component's min label) so every member of a duplicate group
# travels together. The oracle recomputes the same components with its
# recursive CTE and applies the identical md5 bucket to the cluster id.

CLUSTER_SPLIT_ORACLE = """
WITH RECURSIVE toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id AS doc,
           t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' ' || t[CAST(i AS INT) + 2] AS shingle
    FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
), sizes AS (
    SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc
), inter AS (
    SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY 1, 2
), pairs AS (
    SELECT doc_a, doc_b
    FROM inter
    JOIN sizes sa ON sa.doc = inter.doc_a
    JOIN sizes sb ON sb.doc = inter.doc_b
    WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.8
), edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
), reach(doc, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc
), clusters AS (
    SELECT doc AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc
)
SELECT doc_id, cluster_id,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id, cluster_id,
           CAST(('0x' || SUBSTRING(md5('csplit42:' || CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
    FROM clusters
)
"""


@register(
    "llm_cluster_aware_split", oracle=CLUSTER_SPLIT_ORACLE, tags=("llm", "sampling", "dedup")
)
def llm_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof 80/10/10 split: documents bucket by the md5 of their
    near-dup CLUSTER id (connected component over the exact Jaccard pair
    graph), so near-duplicates can never straddle the train/test
    boundary. Composition of llm_dedup_clusters + the deterministic
    md5-bucket split; one extra map-only expression over the cluster
    relation, no additional shuffle beyond the CC computation itself."""
    from data_pipeline_with_spark_kafka_spark.queries.llm import llm_dedup_clusters

    clusters = llm_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("csplit42:"), F.col("cluster_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


QUOTA_SAMPLE_ORACLE = """
SELECT doc_id, lang, CAST(pick_rank AS INT) AS pick_rank
FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS pick_rank
    FROM documents
)
WHERE pick_rank <= CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 80
                             WHEN 'fr' THEN 50 WHEN 'es' THEN 50
                             WHEN 'zh' THEN 50 ELSE 0 END
"""


@register("llm_stratified_quota_sample", oracle=QUOTA_SAMPLE_ORACLE, tags=("llm", "sampling"))
def llm_stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-QUOTA stratified sampling: take exactly n_lang docs per
    language (or all, if fewer exist), selected by a deterministic
    md5 hash order — corpus releases that must hit a target mixture
    EXACTLY, where Bernoulli stratified sampling (llm_stratified_sample)
    only hits it in expectation. Hash order makes the pick
    partitioning-invariant and auditable; per-group bottom-k plans as a
    WindowGroupLimit (partial top-k before the shuffle), so no stratum
    ever sorts globally."""
    from pyspark.sql import Window

    quotas = {"en": 100, "de": 80, "fr": 50, "es": 50, "zh": 50}
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    quota = F.lit(0)
    for lang, n in quotas.items():
        quota = F.when(F.col("lang") == lang, F.lit(n)).otherwise(quota)
    max_quota = max(quotas.values())
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("pick_rank"))
        # constant bound FIRST: rank <= literal is what Spark's
        # WindowGroupLimit rewrite matches, so each task keeps only the
        # per-stratum top-max_quota BEFORE the shuffle — the variable
        # per-lang quota then trims within that bounded set. Without the
        # literal, every stratum sorts fully inside one window partition.
        .filter(F.col("pick_rank") <= F.lit(max_quota))
        .filter(F.col("pick_rank") <= quota)
        .select("doc_id", "lang", F.col("pick_rank").cast("int").alias("pick_rank"))
    )
