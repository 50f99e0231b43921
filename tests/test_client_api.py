"""Client-facade equivalence: every api.py verb returns exactly what
the corresponding graded kernel returns — the facade cannot drift
from the graded semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_support_spark import registry
from hbase_support_spark.api import CellLog, Table


def rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_get_matches_point_get(spark, sf_dir):
    t = Table.open(spark, sf_dir, "customer", key="c_custkey")
    got = t.get(42)
    want = registry.QUERIES["point_get"](spark, sf_dir)
    assert rows(got.select(*want.columns), "c_custkey") == rows(want, "c_custkey")


def test_multi_get_matches_kernel(spark, sf_dir):
    t = Table.open(spark, sf_dir, "customer", key="c_custkey")
    keys = [1, 7, 42, 99]
    got = t.multi_get(keys)
    want = t.df.filter(F.col("c_custkey").isin(keys))
    assert rows(got, "c_custkey") == rows(want, "c_custkey")


def test_scan_range_prefix_limit(spark, sf_dir):
    t = Table.open(spark, sf_dir, "customer", key="c_custkey")
    got = t.scan(start=100, stop=200)
    want = t.df.filter((F.col("c_custkey") >= 100) & (F.col("c_custkey") < 200))
    assert rows(got, "c_custkey") == rows(want, "c_custkey")

    pre = t.scan(prefix="Customer#00000001", key_col="c_name")
    assert all(r["c_name"].startswith("Customer#00000001") for r in pre.collect())
    assert pre.count() > 0

    lim = t.scan(columns=["c_name"], limit=5)
    assert lim.columns == ["c_custkey", "c_name"]
    assert [r["c_custkey"] for r in lim.collect()] == [
        r["c_custkey"]
        for r in t.df.select("c_custkey").orderBy("c_custkey").limit(5).collect()
    ]


def test_celllog_latest_and_versions(spark, sf_dir):
    cl = CellLog.open(spark, sf_dir)
    lat = cl.latest()
    # latest == versions(1) on the value column
    v1 = cl.versions(1).select(
        "user_id", "event_type", F.col("value").alias("latest_value")
    )
    assert rows(
        lat.select("user_id", "event_type", "latest_value"), "user_id", "event_type"
    ) == rows(v1, "user_id", "event_type")
    # versions(n) never exceeds n per group and matches the graded kernel's count
    v3 = cl.versions(3)
    mx = v3.groupBy("user_id", "event_type").count().agg(F.max("count")).collect()[0][0]
    assert mx <= 3
    assert v3.count() == registry.QUERIES["max_versions_n"](spark, sf_dir).count()


def test_celllog_as_of_matches_kernel(spark, sf_dir):
    cl = CellLog.open(spark, sf_dir)
    got = cl.as_of("2024-01-15 12:00:00")
    want = registry.QUERIES["as_of_read"](spark, sf_dir)
    assert rows(got.select(*want.columns), "user_id", "event_type") == rows(
        want, "user_id", "event_type"
    )


def test_celllog_time_range_and_increment(spark, sf_dir):
    cl = CellLog.open(spark, sf_dir)
    tr = cl.time_range("2024-01-10 00:00:00", "2024-01-15 00:00:00")
    lo = F.lit("2024-01-10 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-15 00:00:00").cast("timestamp")
    want = cl.df.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
    assert tr.count() == want.count()
    inc = cl.increment()
    one = inc.filter(F.col("user_id") == 0).collect()[0]
    mine = cl.df.filter(F.col("user_id") == 0).agg(
        F.count("*"), F.round(F.sum("value"), 2)
    ).collect()[0]
    assert (one["n_cells"], one["counter"]) == (mine[0], mine[1])
