"""Physical-layout tests: bucketing kills the join shuffle; sorted
layout gives row-group skipping. These are the storage-side scale
claims of SURVEY.md §1.1/§4, asserted on real plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_support_spark.io import load_table
from hbase_support_spark.sources.layout import (
    bucketed_join,
    write_bucketed,
    write_sorted_by_key,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "t_orders_b", "o_orderkey")
    write_bucketed(
        lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_extendedprice"
        ),
        "t_lineitem_b",
        "o_orderkey",
    )
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    j = bucketed_join(spark, left, right, "o_orderkey")
    j.collect()
    executed = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in executed, executed
    assert "SortMergeJoin" in executed
    assert "Bucketed: true" in executed


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, "o_orderkey").count()
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    want = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    assert got == want


def test_partitioned_layout_prunes_partitions(spark, sf_dir, tmp_path):
    """Date-partitioned layout: a date predicate must prune at the
    PartitionFilters level (files never listed), not post-scan."""
    ev = load_table(spark, sf_dir, "events")
    dst = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").mode(
        "overwrite"
    ).parquet(dst)
    back = spark.read.parquet(dst)
    q = back.filter(F.col("day") == "2024-01-05")
    plan = q._jdf.queryExecution().executedPlan().toString() if q.count() >= 0 else ""
    got = q.count()
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert got == want and got > 0
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters", 1)[1][:120]


def test_sorted_layout_round_trips_and_skips(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    dst = str(tmp_path / "orders_sorted")
    write_sorted_by_key(orders, dst, "o_orderkey", n_files=4)
    back = spark.read.parquet(dst)
    assert back.count() == orders.count()
    # range predicate on the sort key is pushed to the reader
    q = back.filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 200))
    plan = q._jdf.queryExecution().executedPlan().toString()
    got = q.count()
    want = orders.filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 200)).count()
    assert got == want
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(o_orderkey,100)" in plan


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Each z-ordered file must cover a compact 2-D tile: for a small
    2-D box query, the count of files whose (user_id, minute) min/max
    ranges intersect the box must be strictly smaller than under a
    single-key sort, where every file spans the full second dimension."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from hbase_support_spark.io import load_table
    from hbase_support_spark.sources.layout import write_zordered

    ev = load_table(spark, sf_dir, "events").withColumn(
        "minute_idx",
        ((F.col("ts").cast("long") - F.lit(1704067200)) / 60).cast("long"),
    ).select("event_id", "user_id", "minute_idx", "value")

    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(ev, zdir, "user_id", "minute_idx")
    # single-key layout: range-partitioned + sorted by minute only
    (
        ev.repartitionByRange(8, "minute_idx")
        .sortWithinPartitions("minute_idx")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    def files_touching(d, u_lo, u_hi, m_lo, m_hi):
        n = 0
        for p in glob.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(p).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            span = {}
            for col in ("user_id", "minute_idx"):
                los, his = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(names[col]).statistics
                    los.append(st.min); his.append(st.max)
                span[col] = (min(los), max(his))
            if span["user_id"][0] <= u_hi and span["user_id"][1] >= u_lo and \
               span["minute_idx"][0] <= m_hi and span["minute_idx"][1] >= m_lo:
                n += 1
        return n, len(glob.glob(f"{d}/part-*.parquet"))

    # the discriminating box: narrow in users, UNBOUNDED in minutes —
    # the minute-sorted layout can't prune it at all (every file spans
    # all users), while z-tiles bound both dimensions
    box = (2, 4, 0, 10**9)
    z_touch, z_total = files_touching(zdir, *box)
    s_touch, s_total = files_touching(sdir, *box)
    assert s_touch == s_total  # single-key layout: no pruning possible
    assert z_touch < z_total, (z_touch, z_total)  # z-order: real pruning
    assert z_touch < s_touch
