"""Plan-shape regression tests: scans must prune columns and push
predicates (the brief's 'a scan that reads all columns for a 2-column
projection is wrong'), and the hot paths must stay in whole-stage
codegen. These pin the *physical plan*, not just the answer."""

from __future__ import annotations

import os

import pytest

from gossiphs_spark.plans import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.smoke
def test_scan_prunes_columns(spark):
    """tq_token_stats projects (doc_id, text): the parquet ReadSchema must
    not include lang/source/n_chars."""
    plan = plan_of(Q.tq_token_stats(spark, SF_DIR))
    read = plan.split("ReadSchema")[1][:300]
    assert "text" in read and "doc_id" in read
    assert "lang" not in read and "n_chars" not in read and "source" not in read


@pytest.mark.smoke
def test_scan_pushes_filters(spark):
    """dd_simhash filters doc_id < 100: the predicate must reach the
    parquet scan as a pushed filter, not a post-scan Filter only."""
    plan = plan_of(Q.dd_simhash(spark, SF_DIR))
    pushed = plan.split("PushedFilters")[1][:200]
    assert "LessThan(doc_id,100)" in pushed


def test_hot_paths_whole_stage_codegen(spark):
    """The text-mode linking join plan must contain WholeStageCodegen
    spans (JVM-side expressions, no Python in the hot path). AQE wraps
    the plan unfinalized, hiding codegen markers — inspect the static
    physical plan."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(Q.a8_edges(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    # '*(n)' operator prefixes mark whole-stage-codegen spans
    assert "*(1)" in plan and "*(" + plan.split("*(")[1][:2]  # codegen present
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_idf_map_broadcasts(spark):
    """j1_candidate_counts joins the per-name def-count dim — it must be a
    broadcast join (the corpus-sized pair join it replaced was the r1
    50s → 3s rewrite)."""
    plan = plan_of(Q.j1_candidate_counts(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
