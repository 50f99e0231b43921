"""AQE runtime re-planning evidence — SCALE.md's claims that skewed
joins split and small post-shuffle sides promote to broadcast are
asserted against executed plans, not just configured."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def aqe_tuned(spark):
    """Shrink AQE's size thresholds so toy data exhibits the 100-TB
    behaviors; restore after."""
    keys = [
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "1MB"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
    ]
    old = {}
    for k, v in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(aqe_tuned):
    """One key holding ~half the left side must be detected and split
    at runtime: the executed SortMergeJoin is marked isSkew=true."""
    spark = aqe_tuned
    left = spark.range(0, 60_000).select(
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("x" * 64), F.col("id")).alias("pad"),
    )
    right = spark.range(0, 2_000).select(
        F.col("id").alias("k"), F.lit("r").alias("tag")
    )
    j = left.hint("merge").join(right, "k")
    j.collect()  # execute through j's own queryExecution so AQE finalizes it
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead" in plan, plan


def test_aqe_promotes_small_shuffle_side_to_broadcast(aqe_tuned):
    """With static broadcast disabled, a side that turns out tiny at
    runtime must still broadcast: AQE rewrites the planned
    SortMergeJoin into a BroadcastHashJoin after seeing shuffle
    statistics."""
    spark = aqe_tuned
    big = spark.range(0, 50_000).select(
        F.col("id").alias("k"), F.concat(F.lit("y" * 32), F.col("id")).alias("pad")
    )
    small = spark.range(0, 50).select(F.col("id").alias("k"))
    j = big.join(small, "k")
    j.collect()  # execute through j's own queryExecution so AQE finalizes it
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "AdaptiveSparkPlan isFinalPlan=true" in plan, plan


@pytest.fixture()
def bloom_tuned(spark):
    """Enable runtime bloom-filter injection with thresholds shrunk
    to toy scale; force SMJ (a broadcast side gets no bloom — the
    hash build IS its filter); restore after."""
    keys = [
        ("spark.sql.optimizer.runtime.bloomFilter.enabled", "true"),
        ("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
    ]
    old = {}
    for k, v in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_side(bloom_tuned, sf_dir):
    """The 100-TB fact-fact lever beyond partition pruning: when a
    selective dimension side CANNOT broadcast, Spark can still inject
    a bloom_filter_agg on the dim keys and push might_contain into
    the fact scan, pruning most fact rows before the shuffle.
    Asserts the injection appears in the optimized plan AND that
    results are identical with the filter on and off."""
    from hbase_support_spark.io import load_table

    spark = bloom_tuned
    li = load_table(spark, sf_dir, "lineitem")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .filter(F.col("o_totalprice") > 200000)
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan, plan
    assert "might_contain" in plan, plan
    with_bloom = {(r.o_orderpriority, r.n) for r in j.collect()}

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    j2 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan2 = j2._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" not in plan2
    assert with_bloom == {(r.o_orderpriority, r.n) for r in j2.collect()}


def test_dynamic_partition_pruning_on_hive_layout(spark, sf_dir, tmp_path):
    """The partitioned-layout complement of the bloom test: a
    hive-partitioned fact joined to a filtered dim must carry a
    dynamicpruning#N subquery on the fact's PartitionFilters — the
    fact directories outside the dim's surviving keys are never
    listed, the first lever a 100 TB date/tenant-partitioned table
    pulls. Result checked against a static IN-filter rewrite."""
    from hbase_support_spark.io import load_table

    fact_dir = str(tmp_path / "li_by_month")
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    li.write.mode("overwrite").partitionBy("ship_month").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = (
        li.select("ship_month")
        .distinct()
        .filter(F.col("ship_month").between("1997-01", "1997-03"))
    )
    j = fact.join(dim.hint("broadcast"), "ship_month").agg(
        F.count(F.lit(1)).alias("n")
    )
    phys = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in phys.lower(), phys
    got = j.collect()[0].n
    want = fact.filter(F.col("ship_month").between("1997-01", "1997-03")).count()
    assert got == want and got > 0
