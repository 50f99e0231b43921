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
