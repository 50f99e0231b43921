"""Distributed global rank / NTILE kernels (operators/ranking.py):
value-identical to the native single-partition window forms, plan
free of unpartitioned WindowExec over the data path."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window, functions as F

from hbase_support_spark.operators.ranking import ntile_from_rank, with_global_rank


def _mk(spark, vals):
    return spark.createDataFrame(
        [Row(id=i, v=v) for i, v in enumerate(vals)]
    )


@pytest.mark.parametrize(
    "vals",
    [
        [5.0, 3.0, 9.0, 1.0, 7.0, 7.0, 7.0, 2.0],  # ties
        [1.0] * 13,  # all equal (pure tie-break ordering)
        [float(x) for x in range(57)],
        [2.0],  # single row
    ],
)
def test_global_rank_matches_native_row_number(spark, vals):
    df = _mk(spark, vals)
    native = df.select(
        "id", F.row_number().over(Window.orderBy("v", "id")).alias("r")
    )
    ours = with_global_rank(df, ["v", "id"], "r").select("id", "r")
    assert sorted(native.collect()) == sorted(
        [(row.id, row.r) for row in ours.collect()]
    )


def test_global_rank_desc_ordering(spark):
    df = _mk(spark, [5.0, 3.0, 9.0, 3.0, 7.0])
    native = df.select(
        "id",
        F.row_number().over(Window.orderBy(F.col("v").desc(), "id")).alias("r"),
    )
    ours = with_global_rank(df, [F.col("v").desc(), "id"], "r").select("id", "r")
    assert sorted(native.collect()) == sorted(
        [(row.id, row.r) for row in ours.collect()]
    )


@pytest.mark.parametrize("n,k", [(1, 5), (3, 5), (5, 5), (8, 5), (23, 5), (100, 7)])
def test_ntile_from_rank_matches_native(spark, n, k):
    df = _mk(spark, [float(i % 11) for i in range(n)])
    native = df.select(
        "id", F.ntile(k).over(Window.orderBy("v", "id")).alias("t")
    )
    ranked = with_global_rank(df, ["v", "id"], "r", total_col="n")
    ours = ranked.select(
        "id", ntile_from_rank(F.col("r"), F.col("n"), k).alias("t")
    )
    assert sorted(native.collect()) == sorted(
        [(row.id, row.t) for row in ours.collect()]
    )


def test_global_rank_empty_input(spark):
    df = _mk(spark, [1.0]).filter("v > 99")
    out = with_global_rank(df, ["v", "id"], "r", total_col="n")
    assert out.count() == 0


def test_no_global_window_in_data_path(spark):
    """The only unpartitioned Window allowed is the one over the
    K-row per-partition-counts aggregate (metadata scale)."""
    df = _mk(spark, [float(i) for i in range(10)])
    plan = (
        with_global_rank(df, ["v", "id"], "r")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-:* ").strip()
        if s.startswith("Window "):
            groups = re.findall(r"\[[^\[\]]*(?:\[[^\[\]]*\][^\[\]]*)*\]", s)
            if len(groups) == 2 and "_cnt" not in s:
                bad.append(s)
    assert not bad, bad


@pytest.mark.parametrize(
    "deltas",
    [
        [1, 1, -1, 1, -1, -1],
        [1] * 9,
        [5, -3, 2, -2, 7, -9],
        [1],
    ],
)
def test_global_prefix_sum_matches_native(spark, deltas):
    from hbase_support_spark.operators.ranking import with_global_prefix_sum

    df = spark.createDataFrame(
        [Row(id=i, v=float(i % 4), d=d) for i, d in enumerate(deltas)]
    )
    native = df.select(
        "id",
        F.sum("d")
        .over(
            Window.orderBy("v", "id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("c"),
    )
    ours = with_global_prefix_sum(df, ["v", "id"], "d", "c").select("id", "c")
    assert sorted(native.collect()) == sorted(
        [(r.id, r.c) for r in ours.collect()]
    )


@pytest.mark.parametrize(
    "vals",
    [
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3],
        [7] * 6,
        [1],
        [10, 9, 8, 8, 8, 1],
    ],
)
def test_global_prefix_max_matches_native_exclusive(spark, vals):
    from hbase_support_spark.operators.ranking import with_global_prefix_max

    df = spark.createDataFrame(
        [Row(id=i, v=float(i % 3), m=m) for i, m in enumerate(vals)]
    )
    native = df.select(
        "id",
        F.max("m")
        .over(
            Window.orderBy(F.col("v").desc(), "id").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("p"),
    )
    ours = with_global_prefix_max(
        df, [F.col("v").desc(), "id"], "m", "p"
    ).select("id", "p")
    assert sorted(native.collect(), key=lambda r: r.id) == sorted(
        [(r.id, r.p) for r in ours.collect()], key=lambda r: r[0]
    )
