"""Invariant tests for the round-8 operators — recomputation and
structural checks independent of the DuckDB oracle (the
test_round5_ops.py model)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.io import load_table

load_all()


def test_kcore_degree_monotone_and_membership(spark, sf_dir):
    rows = QUERIES["graph_kcore_2step"](spark, sf_dir).collect()
    assert rows, "empty k-core frame"
    for r in rows:
        # peeling only removes edges: degrees cannot grow
        assert r.degree0 >= r.degree1 >= r.degree2 >= 0, r
        # membership flag is exactly the k=3 threshold on round-2 degree
        assert r.in_core_after_2 == (1 if r.degree2 >= 3 else 0), r
    # a vertex that died in round 1 has no round-1 edges either way
    for r in rows:
        if r.degree0 < 3:
            assert r.degree2 == 0, r


def test_kcore_handshake_parity(spark, sf_dir):
    # degree-sum handshake lemma at every peel stage: each surviving
    # undirected edge contributes to exactly two vertices' degrees,
    # so every stage's total degree is even.
    rows = QUERIES["graph_kcore_2step"](spark, sf_dir).collect()
    for field in ("degree0", "degree1", "degree2"):
        assert sum(r[field] for r in rows) % 2 == 0, field


def test_macd_matches_python_recompute(spark, sf_dir):
    out = {
        (r.user_id, r.event_id): r
        for r in QUERIES["win_macd_signal"](spark, sf_dir)
        .filter(F.col("user_id") < 5)
        .collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 5)
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    assert out and ev
    fast = [2.0 ** -(k + 1) for k in range(8)]
    slow = [3.0**k / 4.0 ** (k + 1) for k in range(8)]
    sig = [2.0 ** -(j + 1) for j in range(4)]

    def wma(series, i, weights):
        num = 0.0
        den = 0.0
        for k, w in enumerate(weights):
            # identical left-to-right association as the SQL
            num = num + (series[i - k] if i - k >= 0 else 0.0) * w
            den = den + (w if i - k >= 0 else 0.0)
        return num / den

    by_user: dict = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for u, rows in by_user.items():
        vals = [r.value for r in rows]
        macds = []
        for i in range(len(rows)):
            m = wma(vals, i, fast) - wma(vals, i, slow) + 0.0
            macds.append(m)
        for i, r in enumerate(rows):
            got = out[(u, r.event_id)]
            assert math.isclose(got.macd, macds[i], rel_tol=0, abs_tol=0), (
                u,
                r.event_id,
                got.macd,
                macds[i],
            )
            s = wma(macds, i, sig) + 0.0
            assert got.signal_line == s, (u, r.event_id, got.signal_line, s)
            want = 1 if got.macd > s else (-1 if got.macd < s else 0)
            assert got.stance == want
            checked += 1
    assert checked >= 50


def test_macd_partition_head_is_zero(spark, sf_dir):
    # first event per user: fast == slow == value, so macd == +0.0
    df = QUERIES["win_macd_signal"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id")).alias("f")
    ).select("user_id", F.col("f.event_id").alias("event_id"))
    heads = df.join(first, ["user_id", "event_id"]).select("macd").collect()
    assert heads
    for r in heads:
        assert r.macd == 0.0 and math.copysign(1.0, r.macd) == 1.0, r


def test_inet_octets_reassemble(spark, sf_dir):
    rows = QUERIES["fn_inet_cidr"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.ip_u32 < 2**32
        assert (
            (r.oct1 << 24) | (r.oct2 << 16) | (r.oct3 << 8) | r.oct4
        ) == r.ip_u32
        assert r.ip_str == f"{r.oct1}.{r.oct2}.{r.oct3}.{r.oct4}"
        assert r.net24 == r.ip_u32 >> 8
        priv = (
            r.oct1 == 10
            or (r.oct1 == 172 and 16 <= r.oct2 <= 31)
            or (r.oct1 == 192 and r.oct2 == 168)
        )
        assert r.is_private == (1 if priv else 0)
        assert r.in_demo_cidr12 == (1 if (r.ip_u32 >> 20) == 1365 else 0)


def test_salted_scan_pushes_range_sargs(spark, sf_dir):
    # the 16-branch OR must reach the Parquet reader as PushedFilters
    # on the STORED salted key (row-group min/max skipping), not sit
    # above the scan as a post-filter over a derived column.
    df = QUERIES["scan_salted_rowkey"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert scan, plan
    pushed = " ".join(scan)
    assert "salted_key" in pushed and (
        "GreaterThanOrEqual" in pushed or "Or(" in pushed
    ), pushed


def test_salted_scan_equals_logical_range(spark, sf_dir):
    from hbase_support_spark.operators.scans import _SALT_LO, _SALT_HI

    got = QUERIES["scan_salted_rowkey"](spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    direct = o.filter(
        (F.col("o_orderkey") >= _SALT_LO) & (F.col("o_orderkey") < _SALT_HI)
    )
    assert got.count() == direct.count()
    # the salted key round-trips to the logical key
    for r in got.collect():
        salt, key = r.salted_key.split("|")
        assert int(key) == r.o_orderkey
        assert int(salt) == r.o_orderkey % 16
