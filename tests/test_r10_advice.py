"""Pinned regressions for the four r9-ADVICE findings (fixed in r10).

1. multimodal_feature_extract used Python round() (ties-to-even) against
   a DuckDB ROUND oracle; k/2^32 values equal to odd-j/128 terminate
   exactly ON the 7-digit midpoint and rounded apart. Both sides now
   share FLOOR(x*1e6 + 0.5)/1e6.
2. events_cusum_changepoint carried the walk a = cum_cents*N - rank*T in
   raw int64 on the Spark side (silent wraparound, ANSI off) while the
   oracle's SUM(BIGINT) promotes to HUGEINT; a hot user with large
   values overflows 2^63 and corrupts max_cusum/shifted. The walk now
   rides DECIMAL(38,0) end-to-end.
3. The NULL-on-div-zero oracles assume DuckDB's pre-1.1 x/0 -> NULL;
   duckdb_connect now pins/asserts the semantics so a dependency bump
   fails loudly.
4. round_ie/d_round_ie round negative exact midpoints half-toward-+inf
   (documented, asserted here so the docstring can't rot).
"""

from __future__ import annotations

import math
import shutil

import duckdb
import pytest

from hbase_support_spark import QUERIES, ORACLES
from hbase_support_spark.parity import compare, duckdb_connect


# ---------------------------------------------------------- 1. feature-extract rounding


def test_feature_extract_midpoint_class_pinned():
    """The divergence class: x = k/2^32 with k a multiple of 2^25 is an
    odd-j/128 dyadic that terminates exactly on the 7th decimal digit
    (0.0078125). Python round() gives .007812 (ties-to-even), DuckDB
    ROUND gives .007813 (HALF_UP) — the floor spelling matches HALF_UP
    on both sides."""
    x = 33554432 / 4294967296.0  # 2^25 / 2^32 = 1/128 = 0.0078125 exactly
    assert x == 0.0078125
    assert round(x, 6) == 0.007812  # the old, diverging Python side
    floored = math.floor(x * 1000000 + 0.5) / 1000000.0
    assert floored == 0.007813
    (duck,) = duckdb.sql(
        "SELECT FLOOR(0.0078125::DOUBLE * 1000000 + 0.5) / 1000000.0"
    ).fetchone()
    assert float(duck) == floored


def test_feature_extract_source_uses_floor_spelling():
    """Neither side of multimodal_feature_extract may use engine-native
    rounding: the oracle text must carry the FLOOR form, and the kernel
    closure must not call bare round() (the round_tie_audit emulates
    F.round only, so a Python-side round() is invisible to it)."""
    import inspect

    from hbase_support_spark.operators import udfs

    sql = ORACLES["multimodal_feature_extract"]
    assert "FLOOR(" in sql and "ROUND(" not in sql.upper().replace("FLOOR", "")
    src = inspect.getsource(udfs.multimodal_feature_extract)
    assert "math.floor(" in src
    assert "round(int(" not in src


def test_feature_extract_parity(spark, sf_dir, oracle_con):
    df = QUERIES["multimodal_feature_extract"](spark, sf_dir)
    ok, detail = compare(df, ORACLES["multimodal_feature_extract"], oracle_con)
    assert ok, detail


# ---------------------------------------------------------- 2. cusum int64 headroom


@pytest.fixture(scope="module")
def hot_user_sf(tmp_path_factory, spark):
    """A fixture dir whose events table has a hot user with price-scale
    1e12 values: the walk term cum_cents*N reaches ~2e20 >> 2^63, so an
    int64 Spark-side walk wraps silently while the HUGEINT oracle stays
    exact. 1000 hot rows + 1000 zero rows from other users."""
    d = tmp_path_factory.mktemp("hot_sf")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT i AS event_id,
                 TIMESTAMP '2024-01-01' + INTERVAL (i) SECOND AS ts,
                 CASE WHEN i < 1000 THEN 7 ELSE 100 + i % 50 END AS user_id,
                 'click' AS event_type,
                 CASE WHEN i < 1000 THEN 1e12 ELSE 0.0 END AS value,
                 '{{}}' AS props
          FROM range(2000) r(i)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


def test_cusum_survives_int64_overflow_scale(spark, hot_user_sf):
    """Differential check on the adversarial fixture: with the r9 int64
    walk this wraps (max_cusum sign flips / shifted corrupts); the
    DECIMAL(38,0) walk must match the HUGEINT oracle exactly."""
    con = duckdb_connect(hot_user_sf)
    df = QUERIES["events_cusum_changepoint"](spark, hot_user_sf)
    ok, detail = compare(df, ORACLES["events_cusum_changepoint"], con)
    con.close()
    assert ok, detail


def test_cusum_hot_user_magnitude_exceeds_int64(spark, hot_user_sf):
    """Sanity: the fixture really does exercise the overflow band —
    the hot user's |a| extremum must exceed 2^63."""
    import pyspark.sql.functions as F

    from hbase_support_spark.io import load_table

    ev = load_table(spark, hot_user_sf, "events")
    t_cents, n = ev.agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("long"), F.count("*")
    ).first()
    # hot user max excursion ~ M * v_cents * M_other = 1000 * 1e14 * 1000
    assert t_cents * n > 2**63


# ---------------------------------------------------------- 3. duckdb semantics pin


def test_duckdb_div_zero_semantics_pinned(oracle_con):
    row = oracle_con.execute(
        "SELECT 1.0/0.0, 0.0/0.0, CAST(3 AS DOUBLE)/CAST(0 AS DOUBLE)"
    ).fetchone()
    assert row == (None, None, None)


def test_duckdb_connect_raises_on_ieee_semantics(monkeypatch, tmp_path):
    """If a future duckdb returns inf/NaN for x/0 the connect probe must
    raise instead of letting oracles silently flip."""
    import hbase_support_spark.parity as parity

    class FakeCon:
        def execute(self, sql):
            if "ieee_floating_point_ops" in sql:
                raise duckdb.Error("no such setting")
            return self

        def fetchone(self):
            return (float("inf"), float("nan"))

    monkeypatch.setattr(parity, "TABLES", [])
    monkeypatch.setattr(parity.duckdb, "connect", lambda: FakeCon())
    with pytest.raises(RuntimeError, match="division semantics"):
        parity.duckdb_connect(str(tmp_path))


# ---------------------------------------------------------- 4. signed-midpoint doc pin


def test_round_ie_negative_midpoint_half_toward_plus_inf():
    """round_ie's documented signed-tie behavior: a negative exact
    midpoint rounds UP toward +inf (to the smaller magnitude), unlike
    SQL ROUND's half-away-from-zero. Asserted via the shared formula so
    the num.py docstring stays truthful."""
    x = -0.0000005  # exact: -5e-7 is dyadic? no — but FLOOR sees the double
    got = math.floor(x * 1000000 + 0.5) / 1000000.0
    # -0.0000005 * 1e6 = -0.49999999... (repr error) or -0.5; either way
    # floor(-0.5 + 0.5) = floor(0.0) = 0 -> rounds to 0.0, not -1e-6.
    assert got == 0.0
    (duck,) = duckdb.sql(
        "SELECT FLOOR(-0.0000005::DOUBLE * 1000000 + 0.5) / 1000000.0"
    ).fetchone()
    assert float(duck) == got
    # and the docstring actually documents it
    from hbase_support_spark.num import round_ie

    assert "half-toward-+INF" in round_ie.__doc__ or "+inf" in round_ie.__doc__.lower()


# ---------------------------------------------------------- 5. scratch isolation


def test_scratch_root_is_per_process_and_reaps_dead(tmp_path, monkeypatch):
    """Concurrent engine processes must not share sink paths (r10: a
    parity sweep overwrote .scratch/merge_cust mid-read of a pytest
    process -> FileNotFoundException). scratch_root keys by pid and
    reaps directories left by dead processes, but never a live one."""
    import os

    from hbase_support_spark.io import scratch_root

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    dead = tmp_path / "s_999999999"  # pid far above pid_max
    live = tmp_path / "s_1"  # init: always alive
    dead.mkdir()
    live.mkdir()
    mine = scratch_root()
    assert mine == str(tmp_path / f"s_{os.getpid()}")
    assert os.path.isdir(mine)
    assert not dead.exists(), "dead process scratch must be reaped"
    assert live.exists(), "live process scratch must survive"
