"""Physical-plan assertions: the optimizations SURVEY.md §4 says Catalyst
must supply (pushdown, pruning, broadcast, partial agg, top-k) actually
appear in the plans. These guard the 100 TB story, not just correctness.
"""

from __future__ import annotations

from mapreducelearnings_spark.queries import REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_max_filter_pushes_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "max_filter")
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_orderkey,1000)" in plan
    assert "LessThanOrEqual(l_suppkey,1000)" in plan


def test_follower_count_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "follower_count")
    # scan must read only the grouping key, not all 11 lineitem columns
    assert "ReadSchema: struct<l_suppkey:bigint>" in plan


def test_follower_count_partial_aggregates(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "follower_count")
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_broadcast_join_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "broadcast_join")
    # tree section lists each join once as "BroadcastHashJoin <type> <side> (id)"
    assert plan.count("BroadcastHashJoin Inner") == 2
    assert "SortMergeJoin" not in plan


def test_semi_join_plans_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "semi_join")
    assert "LeftSemi" in plan


def test_top_k_avoids_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "top_k")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_whole_stage_codegen_covers_agg(spark, sf_dir):
    # under AQE the final (executed) plan is the one that shows codegen spans
    df = REGISTRY["pricing_summary"].spark(spark, sf_dir)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark whole-stage-codegen spans in simple explain mode
    assert "*(1)" in plan


def test_pricing_summary_fuses_all_aggregates_one_pass(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    # five aggregate functions computed in ONE partial HashAggregate —
    # the one-pass replacement for the reference's counter piggybacking
    assert plan.count("partial_sum") == 3
    assert "partial_avg" in plan
    assert "partial_count" in plan
