"""Physical-plan assertions — the scale-design contract (SURVEY.md §4).

Correctness tests prove the 60k-row answer; these prove the *plan*
is the one that survives 100 TB: pushdown reached the scan, columns
pruned, dims broadcast, no accidental cartesian products.
"""

from __future__ import annotations

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.plans.explain import (
    codegen_stage_count,
    formatted_plan,
    has_broadcast_join,
    has_cartesian,
    pushed_filters,
    read_schema_columns,
)

load_all()


def test_scan_range_pushes_predicate(spark, sf_dir):
    df = QUERIES["scan_range"](spark, sf_dir)
    assert pushed_filters(df), formatted_plan(df)


def test_point_get_pushes_predicate(spark, sf_dir):
    assert pushed_filters(QUERIES["point_get"](spark, sf_dir))


def test_project_prune_reads_two_columns(spark, sf_dir):
    cols = read_schema_columns(QUERIES["project_prune"](spark, sf_dir))
    assert set(cols) == {"l_orderkey", "l_extendedprice"}


def test_agg_prunes_unused_columns(spark, sf_dir):
    """Q1-shape agg must not read the join keys it never uses."""
    cols = read_schema_columns(QUERIES["agg_sum_min_max_avg"](spark, sf_dir))
    assert "l_partkey" not in cols and "l_suppkey" not in cols


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = QUERIES["join_multiway_star"](spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)


def test_no_cartesian_anywhere_in_flagship(spark, sf_dir):
    assert not has_cartesian(QUERIES["join_multiway_star"](spark, sf_dir))


def test_pairs_blocked_join_is_not_cartesian(spark, sf_dir):
    """Label blocking must compile to an equi-join, not a cross."""
    assert not has_cartesian(QUERIES["sim_pairs_threshold"](spark, sf_dir))


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = formatted_plan(QUERIES["topk_global"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_whole_stage_codegen_present(spark, sf_dir):
    assert codegen_stage_count(QUERIES["agg_sum_min_max_avg"](spark, sf_dir)) >= 1
