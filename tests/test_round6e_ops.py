"""Invariant tests for the round-6 batch-16 operators (SURVEY.md
§5.3): plain-Python/pandas recomputation of the indicator math,
conservation laws over the bulkload plan, and statistical
cross-checks against numpy — properties the SQL oracle can't express
because it restates the same algebra.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.io import load_table

load_all()


def test_rsi_bounds_and_python_recompute(spark, sf_dir):
    """RSI is in [0, 10000] bps, and a plain-Python sliding-window
    recompute over one priority's daily closes reproduces every row."""
    rows = QUERIES["win_rsi_cutler"](spark, sf_dir).collect()
    assert rows and all(0 <= r.rsi_bps <= 10000 for r in rows)
    pri = rows[0].priority
    o = load_table(spark, sf_dir, "orders")
    bars = (
        o.filter(F.col("o_orderpriority") == pri)
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .alias("c")
        )
        .orderBy("o_orderdate")
        .collect()
    )
    closes = [r.c for r in bars]
    days = [r.o_orderdate for r in bars]
    diffs = [b - a for a, b in zip(closes, closes[1:])]
    want = {}
    for i in range(13, len(diffs)):
        win = diffs[i - 13 : i + 1]
        g = sum(d for d in win if d > 0)
        l = sum(-d for d in win if d < 0)
        want[days[i + 1]] = (g, l, 5000 if g + l == 0 else 10000 * g // (g + l))
    got = {r.day: (r.gain_c, r.loss_c, r.rsi_bps) for r in rows if r.priority == pri}
    assert got == want


def test_stochastic_k_envelope_and_d_smoothing(spark, sf_dir):
    """%K sits inside [0, 10000] with close inside the reported
    envelope, and %D is the truncated mean of the three trailing %K
    values (recomputed per event_type from the returned rows plus the
    two warm-up %K bars before the cut)."""
    out = QUERIES["win_stochastic_oscillator"](spark, sf_dir)
    rows = sorted(out.collect(), key=lambda r: (r.event_type, r.day))
    assert rows
    for r in rows:
        assert 0 <= r.k_bps <= 10000
        assert r.ll <= r.close_c <= r.hh
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        # %D of row i uses k of rows i-2..i once past the first two
        # returned rows (earlier rows depend on pre-cut %K warm-up).
        for i in range(2, len(rs)):
            k3 = rs[i - 2].k_bps + rs[i - 1].k_bps + rs[i].k_bps
            assert rs[i].d_bps == k3 // 3


def test_skewness_kurtosis_matches_numpy(spark, sf_dir):
    """Shape statistics agree with a numpy recompute from raw
    quantities (population formulas) to float tolerance, and the
    integer power sums are exactly pandas' sums."""
    import numpy as np
    import pandas as pd

    rows = QUERIES["agg_skewness_kurtosis"](spark, sf_dir).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .toPandas()
    )
    li["v"] = np.floor(li.l_quantity + 0.5).astype("int64")
    for r in rows:
        v = li[(li.l_returnflag == r.l_returnflag) & (li.l_linestatus == r.l_linestatus)].v.to_numpy()
        assert r.n == len(v)
        assert r.s1 == int(v.sum())
        assert r.s4 == int((v.astype(object) ** 4).sum())
        mu = v.mean()
        m2 = ((v - mu) ** 2).mean()
        m3 = ((v - mu) ** 3).mean()
        m4 = ((v - mu) ** 4).mean()
        assert abs(r.skewness - m3 / m2**1.5) < 1e-9
        assert abs(r.kurtosis_excess - (m4 / m2**2 - 3)) < 1e-9


def test_assortativity_matches_pandas_corr(spark, sf_dir):
    """Edge count equals the distinct supplier-customer pair count
    and the coefficient equals pandas' Pearson corr over endpoint
    degrees (different summation order, so float tolerance)."""
    r = QUERIES["graph_degree_assortativity"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_suppkey", "o_custkey")
        .distinct()
        .toPandas()
    )
    assert r.n == len(edges)
    ds = edges.groupby("l_suppkey").size()
    dc = edges.groupby("o_custkey").size()
    x = edges.l_suppkey.map(ds).astype(float)
    y = edges.o_custkey.map(dc).astype(float)
    assert abs(r.assortativity - x.corr(y)) < 1e-9
    assert -1.0 <= r.assortativity <= 1.0


def test_balancer_cost_recompute_and_region_conservation(spark, sf_dir):
    """Server rows conserve regions and requests, and every skew/cost
    column equals the integer recompute from the per-server totals."""
    rows = QUERIES["layout_balancer_cost_model"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_regions = o.select(F.expr("o_custkey div 32")).distinct().count()
    assert sum(r.n_regions for r in rows) == n_regions
    assert sum(r.total_reqs for r in rows) == o.count()
    maxr = max(r.n_regions for r in rows)
    minr = min(r.n_regions for r in rows)
    maxb = max(r.total_bytes for r in rows)
    minb = min(r.total_bytes for r in rows)
    cs = (maxr - minr) * 10000 // maxr
    ss = (maxb - minb) * 10000 // maxb
    for r in rows:
        assert r.count_skew_bps == cs
        assert r.size_skew_bps == ss
        assert r.cluster_cost_bps == (6 * cs + 4 * ss) // 10


def test_bulkload_plan_conservation_and_sortedness(spark, sf_dir):
    """HFile plan conserves bytes and KV counts, never crosses a
    region boundary, respects the 8 KiB cut (up to one straddling
    KV), and files are key-ordered within each region."""
    rows = QUERIES["cells_bulkload_hfile_plan"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    tot = ev.select(
        F.sum(F.lit(32) + F.length("event_type") + F.length("props")).alias("b"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert sum(r.file_bytes for r in rows) == tot.b
    assert sum(r.n_kvs for r in rows) == tot.n
    max_kv = ev.select(
        F.max(F.lit(32) + F.length("event_type") + F.length("props"))
    ).collect()[0][0]
    by_region = {}
    for r in rows:
        assert r.first_key // 16 == r.region and r.last_key // 16 == r.region
        assert r.first_key <= r.last_key
        assert r.file_bytes <= 8192 + max_kv
        by_region.setdefault(r.region, []).append(r)
    for region, fs in by_region.items():
        fs.sort(key=lambda r: r.hfile)
        assert [f.hfile for f in fs] == list(range(len(fs)))
        for a, b in zip(fs, fs[1:]):
            assert a.last_key <= b.first_key
