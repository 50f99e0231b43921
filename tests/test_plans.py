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


def test_aqe_splits_skewed_join(spark, tmp_path):
    """AQE skew-join handling: a join where one key holds ~95% of the
    rows must execute with skew-split partitions (the executedPlan
    advertises isSkew/skew markers), not one straggler task. This is
    the runtime half of the skew story — salting (agg_salted_two_phase)
    is the planning half."""
    import pyspark.sql.functions as F

    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = spark.read.parquet(lp).join(spark.read.parquet(rp), "k")
        # execute THIS DataFrame: count() builds a separate query
        # execution, so AQE would never finalize j's own plan
        assert len(j.collect()) == 190_250
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_tpch_q2_broadcasts_dims_and_prunes(spark, sf_dir):
    """Q2's part/supplier/nation/region joins must all broadcast; the
    double aggregation shuffles only (partkey, suppkey) partials."""
    df = QUERIES["tpch_q2_min_cost_supplier"](spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)
    assert not has_cartesian(df)


def test_tpch_q7_seven_table_star_broadcasts(spark, sf_dir):
    df = QUERIES["tpch_q7_volume"](spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)
    assert not has_cartesian(df)


def test_fn_unpivot_pushes_filter_below_expand(spark, sf_dir):
    """The orderkey filter must reach the scan — the 4x row expand
    happens after pruning, never before."""
    df = QUERIES["fn_unpivot"](spark, sf_dir)
    assert pushed_filters(df), formatted_plan(df)


def test_pipeline_train_ready_stays_codegen(spark, sf_dir):
    """The composed pipeline must contain no Python evaluation and no
    cartesian product — whole chain in JVM expressions."""
    plan = formatted_plan(QUERIES["pipeline_train_ready"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_knn_join_blas_is_arrow_not_row_python(spark, sf_dir):
    plan = formatted_plan(QUERIES["sim_knn_self_join_blas"](spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "BatchEvalPython" not in plan


def test_stream_topk_ranks_aggregated_rows_only(spark, sf_dir):
    """The window function's input must be the aggregate, not raw
    events: exactly one pre-rank aggregate shuffle on window_start."""
    plan = formatted_plan(QUERIES["stream_topk_per_window"](spark, sf_dir))
    assert "Window" in plan and "HashAggregate" in plan, plan


def test_partitioned_layout_prunes_partitions(spark, sf_dir, tmp_path):
    """A filter on the partition column must appear as PartitionFilters
    (directory pruning), not a data filter — the §2.1 scale story for
    date/status-partitioned tables."""
    from pyspark.sql import functions as F

    from hbase_support_spark.io import load_table

    d = str(tmp_path / "by_status")
    load_table(spark, sf_dir, "orders").write.partitionBy("o_orderstatus").parquet(d)
    df = spark.read.parquet(d).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], plan


def test_bucketed_colocated_join_has_single_exchange(spark, sf_dir):
    """The graded bucketed fact-to-fact join must read co-located
    buckets: SortMergeJoin fed by bucketed scans, with the final
    status aggregate as the ONLY Exchange in the plan."""
    import re

    plan = formatted_plan(QUERIES["join_bucketed_colocated"](spark, sf_dir))
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    tree = plan.split("\n\n")[0]  # the numbered tree section
    assert len(re.findall(r"\bExchange\b", tree)) == 1, tree
