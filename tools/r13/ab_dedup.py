"""Interleaved A/B of the round-13 dedup/curation rewrites against the
r12 forms rebuilt inline (same session, same contention windows):

- ngram_jaccard: fused hashed_shingles + no sort + PPJoin length filter
  vs array_sort(transform(shingles)) + unfiltered candidates
- containment: fused/no-sort base vs r12 base
- minhash_lsh: fused signature base vs r12 base
- shared_span_fraction: fused explode vs two-lambda explode

    python tools/r13/ab_dedup.py [rounds]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
    from data_pipeline_with_spark_kafka_spark.operators import curation, dedup
    from data_pipeline_with_spark_kafka_spark.operators.text import shingles, tokens
    from data_pipeline_with_spark_kafka_spark.session import get_spark
    from data_pipeline_with_spark_kafka_spark.sources.tables import load_table_fanned
    from tools.ab_bench import ab

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-dedup")

    def docs():
        return load_table_fanned(spark, sf_dir, "documents")

    def jaccard_r12():
        t = 0.8
        base = docs().select(
            F.col("doc_id").alias("doc"),
            F.array_sort(
                F.transform(shingles(tokens(F.col("text")), 3), lambda s: F.xxhash64(s))
            ).alias("sh"),
        ).filter(F.size("sh") > 0).persist()
        sh = base.select("doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_count"))
        rarity = Window.partitionBy("doc").orderBy("df_count", "shingle")
        prefix_len = F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1
        prefix = (
            sh.join(freq, "shingle")
            .withColumn("rn", F.row_number().over(rarity))
            .filter(F.col("rn") <= prefix_len)
            .select("doc", "shingle")
        )
        a, b = prefix.alias("a"), prefix.alias("b")
        cand = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"])
        )
        sets = base.select("doc", "sh")
        pairs = (
            cand.join(sets.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
            .join(sets.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return (
            pairs.withColumn("jaccard", round_to(inter / union, 4))
            .filter(F.col("jaccard") >= t)
            .select("doc_a", "doc_b", "jaccard")
        )

    print(f"== ngram_jaccard (load {os.getloadavg()[0]:.2f}) ==", flush=True)
    ab(spark, {
        "r13": lambda: dedup.ngram_jaccard_pairs(docs(), "doc_id", "text", k=3, threshold=0.8),
        "r12_inline": jaccard_r12,
    }, rounds=rounds)

    def containment_r12():
        t = 0.9
        base = docs().select(
            F.col("doc_id").alias("doc"),
            F.array_sort(
                F.transform(shingles(tokens(F.col("text")), 3), lambda s: F.xxhash64(s))
            ).alias("sh"),
        ).filter(F.size("sh") > 0).persist()
        sh = base.select("doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_count"))
        rarity = Window.partitionBy("doc").orderBy("df_count", "shingle")
        prefix_len = F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1
        prefix = (
            sh.join(freq, "shingle")
            .withColumn("rn", F.row_number().over(rarity))
            .filter(F.col("rn") <= prefix_len)
            .select("doc", "n_sh", "shingle")
        )
        full_index = sh.select("doc", "n_sh", "shingle")
        cand = (
            prefix.alias("a")
            .join(full_index.alias("b"),
                  (F.col("a.shingle") == F.col("b.shingle"))
                  & (F.col("a.doc") != F.col("b.doc"))
                  & (F.col("b.n_sh") >= F.lit(t) * F.col("a.n_sh")))
            .select(F.col("a.doc").alias("doc_contained"), F.col("b.doc").alias("doc_container"))
            .dropDuplicates(["doc_contained", "doc_container"])
        )
        sets = base.select("doc", "sh")
        pairs = (
            cand.join(sets.withColumnRenamed("doc", "doc_contained").withColumnRenamed("sh", "sh_a"), "doc_contained")
            .join(sets.withColumnRenamed("doc", "doc_container").withColumnRenamed("sh", "sh_b"), "doc_container")
        )
        containment = F.size(F.array_intersect("sh_a", "sh_b")) / F.size("sh_a")
        return (
            pairs.withColumn("containment", round_to(containment, 4))
            .filter(F.col("containment") >= t)
            .select("doc_contained", "doc_container", "containment")
        )

    print(f"== containment (load {os.getloadavg()[0]:.2f}) ==", flush=True)
    ab(spark, {
        "r13": lambda: dedup.containment_pairs(docs(), "doc_id", "text", k=3, threshold=0.9),
        "r12_inline": containment_r12,
    }, rounds=rounds)

    def minhash_r12():
        sh_hashed = F.transform(shingles(tokens(F.col("text")), 3), lambda s: F.xxhash64(s))
        base = docs().select(F.col("doc_id").alias("doc"), sh_hashed.alias("sh")).filter(F.size("sh") > 0)
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(dedup.NUM_HASHES - 1)),
            lambda seed: F.array_min(F.transform(F.col("sh"), lambda h: F.xxhash64(h, seed))),
        )
        sigs = base.select("doc", "sh", sig.alias("sig")).persist()
        banded = dedup.band_buckets(sigs)
        a, b = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"])
        )
        sets = sigs.select("doc", "sh")
        pairs = (
            cand.join(sets.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
            .join(sets.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return (
            pairs.withColumn("jaccard", round_to(inter / union, 4))
            .filter(F.col("jaccard") >= 0.8)
            .select("doc_a", "doc_b", "jaccard")
        )

    print(f"== minhash_lsh (load {os.getloadavg()[0]:.2f}) ==", flush=True)
    ab(spark, {
        "r13": lambda: dedup.minhash_lsh_pairs(docs(), "doc_id", "text", k=3, threshold=0.8),
        "r12_inline": minhash_r12,
    }, rounds=rounds)

    def span_r12():
        k = 5
        sh = (
            docs().select(F.col("doc_id"), tokens(F.col("text")).alias("_t"))
            .select(
                F.col("doc_id"),
                F.explode(F.transform(shingles(F.col("_t"), k), lambda s: F.xxhash64(s))).alias("shingle"),
            )
            .persist()
        )
        shared = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_n_docs"))
            .filter(F.col("_n_docs") > 1).select("shingle")
        )
        n_shared = sh.join(shared, "shingle", "left_semi").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shared"))
        counted = docs().select(F.col("doc_id"), tokens(F.col("text")).alias("_t")).select(
            F.col("doc_id"), F.size(shingles(F.col("_t"), k)).cast("bigint").alias("n_spans")
        )
        frac = F.coalesce(round_to(F.col("n_shared") / F.col("n_spans"), 4), F.lit(0.0))
        return counted.join(n_shared, "doc_id", "left").select(
            "doc_id", "n_spans",
            F.coalesce("n_shared", F.lit(0).cast("bigint")).alias("n_shared"),
            frac.alias("shared_frac"), (frac >= 0.5).alias("templated"),
        )

    print(f"== shared_span_fraction (load {os.getloadavg()[0]:.2f}) ==", flush=True)
    ab(spark, {
        "r13": lambda: curation.shared_span_fraction(docs(), "doc_id", "text", k=5, threshold=0.5),
        "r12_inline": span_r12,
    }, rounds=rounds)

    spark.stop()


if __name__ == "__main__":
    main()
