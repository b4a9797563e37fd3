"""Linear (fasttext-style) quality-classifier scoring over documents.

The DCLM / fineweb-edu curation shape: a trained linear model assigns
each document P(keep) from a bag-of-tokens score and the pipeline
filters on it. Training happens offline; what the engine must do at
corpus scale is SCORING: tokens -> vocabulary weight lookup -> per-doc
mean weight -> sigmoid -> threshold.

Weights here are a deterministic function of the token text (so both
engines derive the identical "model" without shipping an artifact);
swapping in real learned weights changes nothing structurally.

Scale notes (100 TB design):
- the vocabulary is frequency-top-k over the corpus (vocabulary-sized
  relation, limit-bounded) and is explicitly broadcast — the token
  stream never shuffles for the lookup;
- the only corpus-sized shuffle is the per-doc aggregation, which
  combines map-side (sum/count per doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_kafka_spark.functions.rounding import round_to
from data_pipeline_with_spark_kafka_spark.queries.registry import register
from data_pipeline_with_spark_kafka_spark.sources.tables import load_table

VOCAB_K = 500
BIAS = 0.1

QUALITY_CLASSIFIER_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
), vocab AS (
  SELECT token,
         ((ascii(token) * 7 + length(token) * 13) % 41 - 20) / 20.0 AS w
  FROM (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        ORDER BY cnt DESC, token LIMIT {VOCAB_K})
), scored AS (
  SELECT t.doc_id, SUM(COALESCE(v.w, 0.0)) AS sw, COUNT(*) AS n_tokens
  FROM tok t LEFT JOIN vocab v USING (token)
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(1.0 / (1.0 + exp(-(sw / n_tokens - {BIAS}))), 6) AS quality_prob,
       1.0 / (1.0 + exp(-(sw / n_tokens - {BIAS}))) > 0.5 AS keep
FROM scored
"""


def _weight(token: Column) -> Column:
    """Deterministic stand-in for a learned token weight in [-1, 1]."""
    return ((F.ascii(token) * 7 + F.length(token) * 13) % 41 - 20) / 20.0


@register("llm_quality_classifier", oracle=QUALITY_CLASSIFIER_ORACLE, tags=("llm", "quality"))
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with a linear bag-of-tokens model: mean
    vocabulary weight -> sigmoid -> keep/drop. Vocabulary = corpus
    top-500 tokens (limit-bounded, broadcast); one per-doc shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(VOCAB_K)
        .select("token", _weight(F.col("token")).alias("w"))
    )
    scored = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("w"), F.lit(0.0))).alias("sw"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    prob = 1.0 / (1.0 + F.exp(-(F.col("sw") / F.col("n_tokens") - BIAS)))
    return scored.select(
        "doc_id",
        "n_tokens",
        round_to(prob, 6).alias("quality_prob"),
        (prob > 0.5).alias("keep"),
    )


# --------------------------------------------------------------------------
# Classifier evaluation: tie-aware ROC-AUC + confusion metrics
# --------------------------------------------------------------------------
#
# The eval half of the curation loop: how well does the cheap linear
# scorer reproduce the expensive rule label (Gopher pass)? AUC comes from
# the rank-sum (Mann-Whitney U) identity computed in SCORE-GROUP space:
# scores are binned to 4 decimals (standard practice for distributed AUC
# — bounds the grouped relation at <= 20k rows no matter the corpus), the
# only window runs over that bounded relation, and every term is exact
# half-integer arithmetic on counts, so the result is bit-identical
# across engines before rounding.

CLASSIFIER_AUC_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
), vocab AS (
  SELECT token,
         ((ascii(token) * 7 + length(token) * 13) % 41 - 20) / 20.0 AS w
  FROM (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        ORDER BY cnt DESC, token LIMIT {VOCAB_K})
), prob AS (
  SELECT t.doc_id,
         ROUND(1.0 / (1.0 + exp(-(SUM(COALESCE(v.w, 0.0)) / COUNT(*) - {BIAS}))), 6) AS p
  FROM tok t LEFT JOIN vocab v USING (token)
  GROUP BY t.doc_id
), toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
), base AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         ROUND((length(text) - (len(t) - 1)) * 1.0 / len(t), 4) AS mean_word_len
  FROM toks
), bi AS (
  SELECT doc_id, COUNT(*) AS total_bi, COUNT(DISTINCT bg) AS distinct_bi
  FROM (
      SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bg
      FROM toks, UNNEST(range(1, len(t))) AS r(i)
  )
  GROUP BY doc_id
), tf AS (
  SELECT doc_id, MAX(cnt) AS top_cnt
  FROM (
      SELECT doc_id, w, COUNT(*) AS cnt
      FROM (SELECT doc_id, UNNEST(t) AS w FROM toks)
      GROUP BY doc_id, w
  )
  GROUP BY doc_id
), lab AS (
  SELECT base.doc_id,
         CASE WHEN (base.n_tokens BETWEEN 10 AND 1000
              AND base.mean_word_len BETWEEN 3 AND 10
              AND CASE WHEN COALESCE(bi.total_bi, 0) = 0 THEN 0.0
                       ELSE ROUND(1.0 - bi.distinct_bi * 1.0 / bi.total_bi, 4) END <= 0.6
              AND ROUND(tf.top_cnt * 1.0 / base.n_tokens, 4) <= 0.25)
              THEN 1 ELSE 0 END AS y
  FROM base
  LEFT JOIN bi ON bi.doc_id = base.doc_id
  JOIN tf ON tf.doc_id = base.doc_id
), sc AS (
  SELECT prob.doc_id, ROUND(prob.p, 4) AS s, lab.y, prob.p
  FROM prob JOIN lab USING (doc_id)
), grp AS (
  SELECT s, COUNT(*) AS n_g, SUM(y) AS npos_g FROM sc GROUP BY s
), ranked AS (
  SELECT n_g, npos_g,
         COALESCE(SUM(n_g) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM grp
), u AS (
  SELECT SUM(npos_g * (cb + (n_g + 1) / 2.0)) AS spr,
         SUM(npos_g) AS npos, SUM(n_g) AS n
  FROM ranked
), conf AS (
  SELECT SUM(CASE WHEN p > 0.5 AND y = 1 THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN p > 0.5 AND y = 0 THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN p <= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS fn,
         SUM(CASE WHEN p <= 0.5 AND y = 0 THEN 1 ELSE 0 END) AS tn
  FROM sc
)
SELECT CAST(u.npos AS BIGINT) AS n_pos,
       CAST(u.n - u.npos AS BIGINT) AS n_neg,
       ROUND((u.spr - u.npos * (u.npos + 1) / 2.0)
             / NULLIF(u.npos * (u.n - u.npos), 0), 6) AS auc,
       ROUND((conf.tp + conf.tn) * 1.0 / u.n, 6) AS accuracy,
       ROUND(conf.tp * 1.0 / NULLIF(conf.tp + conf.fp, 0), 6) AS precision_keep,
       ROUND(conf.tp * 1.0 / NULLIF(conf.tp + conf.fn, 0), 6) AS recall_keep,
       ROUND(2.0 * conf.tp / NULLIF(2 * conf.tp + conf.fp + conf.fn, 0), 6) AS f1_keep
FROM u, conf
"""


@register("llm_classifier_eval_auc", oracle=CLASSIFIER_AUC_ORACLE, tags=("llm", "quality"))
def llm_classifier_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the linear quality scorer against the Gopher rule label:
    tie-aware ROC-AUC (Mann-Whitney rank-sum) plus confusion metrics at
    the 0.5 threshold, in one row.

    Scale shape: scores bin to 4 decimals, so the grouped relation the
    rank window runs over is bounded at <= 20,001 rows REGARDLESS of
    corpus size — the global orderBy is over that count-compacted
    relation, never the corpus. Rank terms are half-integer count
    arithmetic (exactly representable doubles), so AUC is bit-identical
    across engines before the final rounding."""
    from data_pipeline_with_spark_kafka_spark.queries.text_extra import (
        llm_quality_gopher,
    )
    from pyspark.sql import Window

    probs = llm_quality_classifier(spark, sf_dir).select(
        "doc_id", F.col("quality_prob").alias("p")
    )
    labels = llm_quality_gopher(spark, sf_dir).select(
        "doc_id", F.col("passes").cast("int").alias("y")
    )
    # Persist (dedup.py cache contract): the scored relation feeds BOTH the
    # rank-sum branch (grp) and the confusion aggregate below — without it
    # the entire probs+labels pipeline (vocab build, scoring join, Gopher
    # metrics) computes twice per run. Doc-sized, 3 narrow columns.
    # Lifecycle (round-13 advice): the returned plan is lazy, so THIS
    # function cannot unpersist — ownership of the blocks passes to
    # whoever materializes the result (bench.py / driver_sim call
    # spark.catalog.clearCache() per query; long-lived embedders must do
    # the same or unpersist via the plan's cached ancestors).
    sc = probs.join(labels, "doc_id").select(
        round_to(F.col("p"), 4).alias("s"), "y", "p"
    ).persist()
    grp = sc.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("y").alias("npos_g")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grp.select(
        "n_g", "npos_g", F.coalesce(F.sum("n_g").over(w), F.lit(0)).alias("cb")
    )
    u = ranked.agg(
        F.sum(F.col("npos_g") * (F.col("cb") + (F.col("n_g") + F.lit(1)) / F.lit(2.0))).alias("spr"),
        F.sum("npos_g").alias("npos"),
        F.sum("n_g").alias("n"),
    )
    pred = F.col("p") > 0.5
    conf = sc.agg(
        F.sum((pred & (F.col("y") == 1)).cast("long")).alias("tp"),
        F.sum((pred & (F.col("y") == 0)).cast("long")).alias("fp"),
        F.sum((~pred & (F.col("y") == 1)).cast("long")).alias("fn"),
        F.sum((~pred & (F.col("y") == 0)).cast("long")).alias("tn"),
    )
    npos, n = F.col("npos"), F.col("n")
    nneg = n - npos
    return (
        u.crossJoin(F.broadcast(conf))
        .select(
            npos.cast("long").alias("n_pos"),
            nneg.cast("long").alias("n_neg"),
            round_to(
                (F.col("spr") - npos * (npos + F.lit(1)) / F.lit(2.0))
                / F.nullif((npos * nneg).cast("double"), F.lit(0.0)),
                6,
            ).alias("auc"),
            round_to((F.col("tp") + F.col("tn")) / n.cast("double"), 6).alias("accuracy"),
            round_to(
                F.col("tp") / F.nullif((F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0)), 6
            ).alias("precision_keep"),
            round_to(
                F.col("tp") / F.nullif((F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0)), 6
            ).alias("recall_keep"),
            round_to(
                F.lit(2.0) * F.col("tp")
                / F.nullif((F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"), F.lit(0.0)),
                6,
            ).alias("f1_keep"),
        )
    )


# --------------------------------------------------------------------------
# Calibration: reliability bins (the ECE decomposition)
# --------------------------------------------------------------------------
#
# Completes the eval pair with llm_classifier_eval_auc: AUC measures
# ranking, calibration measures whether the probabilities MEAN anything.
# Standard reliability-diagram binning (Guo et al., ICML 2017): 10 equal-
# width confidence bins, per-bin mean confidence vs empirical positive
# rate, |gap| weighted by bin mass = the bin's ECE contribution. All
# count/average arithmetic — one aggregate over the scored corpus, any
# scale.

CLASSIFIER_CALIBRATION_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
), vocab AS (
  SELECT token,
         ((ascii(token) * 7 + length(token) * 13) % 41 - 20) / 20.0 AS w
  FROM (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        ORDER BY cnt DESC, token LIMIT {VOCAB_K})
), prob AS (
  SELECT t.doc_id,
         ROUND(1.0 / (1.0 + exp(-(SUM(COALESCE(v.w, 0.0)) / COUNT(*) - {BIAS}))), 6) AS p
  FROM tok t LEFT JOIN vocab v USING (token)
  GROUP BY t.doc_id
), toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
), base AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         ROUND((length(text) - (len(t) - 1)) * 1.0 / len(t), 4) AS mean_word_len
  FROM toks
), bi AS (
  SELECT doc_id, COUNT(*) AS total_bi, COUNT(DISTINCT bg) AS distinct_bi
  FROM (
      SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bg
      FROM toks, UNNEST(range(1, len(t))) AS r(i)
  )
  GROUP BY doc_id
), tf AS (
  SELECT doc_id, MAX(cnt) AS top_cnt
  FROM (
      SELECT doc_id, w, COUNT(*) AS cnt
      FROM (SELECT doc_id, UNNEST(t) AS w FROM toks)
      GROUP BY doc_id, w
  )
  GROUP BY doc_id
), lab AS (
  SELECT base.doc_id,
         CASE WHEN (base.n_tokens BETWEEN 10 AND 1000
              AND base.mean_word_len BETWEEN 3 AND 10
              AND CASE WHEN COALESCE(bi.total_bi, 0) = 0 THEN 0.0
                       ELSE ROUND(1.0 - bi.distinct_bi * 1.0 / bi.total_bi, 4) END <= 0.6
              AND ROUND(tf.top_cnt * 1.0 / base.n_tokens, 4) <= 0.25)
              THEN 1 ELSE 0 END AS y
  FROM base
  LEFT JOIN bi ON bi.doc_id = base.doc_id
  JOIN tf ON tf.doc_id = base.doc_id
), sc AS (
  SELECT LEAST(CAST(FLOOR(prob.p * 10) AS INT), 9) AS bin, prob.p, lab.y
  FROM prob JOIN lab USING (doc_id)
), tot AS (
  SELECT COUNT(*) AS n FROM sc
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(p), 6) AS mean_confidence,
       ROUND(AVG(CAST(y AS DOUBLE)), 6) AS frac_positive,
       ROUND(ABS(ROUND(AVG(p), 6) - ROUND(AVG(CAST(y AS DOUBLE)), 6)), 6) AS abs_gap,
       ROUND(COUNT(*) * ABS(ROUND(AVG(p), 6) - ROUND(AVG(CAST(y AS DOUBLE)), 6))
             / (SELECT n FROM tot), 6) AS ece_contribution
FROM sc
GROUP BY bin
"""


@register(
    "llm_classifier_calibration", oracle=CLASSIFIER_CALIBRATION_ORACLE, tags=("llm", "quality")
)
def llm_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the linear quality scorer vs the
    Gopher label (Guo et al. 2017): 10 equal-width confidence bins,
    per-bin mean confidence vs empirical positive rate, mass-weighted
    |gap| = the bin's ECE contribution (sum the column for ECE).

    Scale shape: ONE count/sum aggregate over the scored corpus into 10
    groups plus a 1-row total broadcast — no windows, no sorts; the gap
    arithmetic runs on per-bin averages computed from exact counts."""
    from data_pipeline_with_spark_kafka_spark.queries.text_extra import (
        llm_quality_gopher,
    )

    probs = llm_quality_classifier(spark, sf_dir).select(
        "doc_id", F.col("quality_prob").alias("p")
    )
    labels = llm_quality_gopher(spark, sf_dir).select(
        "doc_id", F.col("passes").cast("int").alias("y")
    )
    sc = probs.join(labels, "doc_id").select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        "p",
        "y",
    ).persist()
    # Persist: consumed by the 10-bin aggregate AND the 1-row total — one
    # scoring pass instead of two (same contract as the AUC twin above,
    # including the round-13 lifecycle note: the materializing caller
    # owns the blocks and must clearCache/unpersist, as bench.py does).
    tot = sc.agg(F.count(F.lit(1)).alias("n"))
    mean_conf = round_to(F.avg("p"), 6)
    frac_pos = round_to(F.avg(F.col("y").cast("double")), 6)
    binned = sc.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        mean_conf.alias("mean_confidence"),
        frac_pos.alias("frac_positive"),
    )
    gap = F.abs(F.col("mean_confidence") - F.col("frac_positive"))
    return (
        binned.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_docs",
            "mean_confidence",
            "frac_positive",
            round_to(gap, 6).alias("abs_gap"),
            round_to(F.col("n_docs") * gap / F.col("n"), 6).alias("ece_contribution"),
        )
    )
