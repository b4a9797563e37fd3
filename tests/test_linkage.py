"""Blocked fuzzy record linkage (operators/linkage.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_pipeline_with_spark_kafka_spark.operators.linkage import blocked_fuzzy_match


def _frames(spark):
    clean = spark.createDataFrame(
        [(1, "alpha widget"), (2, "beta widget"), (3, "alpha gadget"), (4, "zeta gizmo")],
        "cid int, name string",
    )
    dirty = spark.createDataFrame(
        [
            (10, "alpha widgex"),   # lev 1 to cid 1 (same block 'widgex'? no — see block)
            (11, "beta widget"),    # exact duplicate of cid 2
            (12, "completely off"), # no block mate
        ],
        "did int, name string",
    )
    return dirty, clean


def _match(spark, max_dist=2):
    dirty, clean = _frames(spark)
    return blocked_fuzzy_match(
        dirty,
        clean,
        dirty_id="did",
        dirty_text="name",
        clean_id="cid",
        clean_text="name",
        dirty_block=F.expr("substr(name, -3)"),
        clean_block=F.expr("substr(name, -3)"),
        max_dist=max_dist,
    )


def test_linkage_best_match_and_bound(spark):
    got = {r.d_key: (r.matched_cid, r.lev) for r in _match(spark).collect()}
    # 10 blocks on 'gex' — no clean mate shares it, so no candidates.
    # 11 matches cid 2 exactly (lev 0) inside block 'get'.
    assert got == {11: (2, 0)}


def test_linkage_tie_breaks_on_clean_id(spark):
    clean = spark.createDataFrame(
        [(5, "aaa x"), (2, "aab x"), (9, "aac x")], "cid int, name string"
    )
    dirty = spark.createDataFrame([(1, "aad x")], "did int, name string")
    out = blocked_fuzzy_match(
        dirty, clean, "did", "name", "cid", "name",
        F.expr("substr(name, -1)"), F.expr("substr(name, -1)"), max_dist=2,
    ).collect()
    # all three candidates at lev 1 -> smallest clean id wins
    assert [(r.matched_cid, r.lev) for r in out] == [(2, 1)]


def test_linkage_no_cartesian_plan(spark):
    plan = _match(spark)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
