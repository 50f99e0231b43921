"""r9 ROUND-midpoint audit — pytest wrapper for
tools/round_tie_audit.py (the class the boundary drill caught in
events_cusum_changepoint).

Spark's F.round(double, n) is BigDecimal shortest-repr HALF_UP;
DuckDB's ROUND multiply-rounds the binary value. They disagree when
an exact rational lands ON an (n+1)-digit decimal midpoint at a
magnitude where the x·10^n product's representation error crosses
half-ulp. This sweep runs every oracle with ROUND swapped for the
divergence probe (the Spark result is computable inside DuckDB via
VARCHAR→DECIMAL) and fails on any query whose TODAY-bytes would
grade differently across the engines. Canaries pin both probes
against regressions in the macro spelling.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from hbase_support_spark import ORACLES, load_all
from hbase_support_spark.parity import duckdb_connect
from tools.round_tie_audit import _MACRO_DIVERGE, _MACRO_STRUCT, STRUCT_IMMUNE

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _poisoned(con, sql: str) -> bool:
    rows = con.execute(sql.replace("ROUND(", "R9PROBE(")).fetchall()
    return any(
        isinstance(v, float) and math.isfinite(v) and v == 1e99
        for row in rows
        for v in row
    )


def test_divergence_canary():
    """The probe must catch the exact cusum-class value: 176.08825
    rounds to .0883 under Spark's shortest-repr HALF_UP but .0882
    under DuckDB's multiply path."""
    con = duckdb.connect()
    con.execute(_MACRO_DIVERGE)
    assert _poisoned(con, "SELECT ROUND(CAST(176.08825 AS DOUBLE), 4) AS x")
    # and must NOT fire where the engines agree (cents at n=1)
    assert not _poisoned(con, "SELECT ROUND(CAST(901.85 AS DOUBLE), 1) AS x")


def test_structural_canary():
    """The structural probe must flag a value terminating beyond its
    scale and pass one terminating within it."""
    con = duckdb.connect()
    con.execute(_MACRO_STRUCT)
    assert _poisoned(con, "SELECT ROUND(CAST(0.1234567 AS DOUBLE), 6) AS x")
    assert not _poisoned(con, "SELECT ROUND(CAST(0.123456 AS DOUBLE), 6) AS x")


_TODO = sorted(n for n in ORACLES if "ROUND(" in ORACLES[n])


@pytest.fixture(scope="module")
def con():
    return duckdb_connect(SF_DIR)


@pytest.mark.parametrize("name", _TODO)
def test_no_cross_engine_round_divergence(con, name):
    """No oracle value may round differently across the engines on
    the current fixture bytes."""
    con.execute(_MACRO_DIVERGE)
    assert not _poisoned(con, ORACLES[name]), (
        f"{name}: a ROUND site would grade differently on Spark vs "
        "DuckDB for today's bytes — respell it with num.round_ie/"
        "d_round_ie or an exact-integer rounding path"
    )


def test_spark_emulation_matches_f_round(spark):
    """The divergence probe's Spark-emulation macro (VARCHAR →
    DECIMAL(38,18) HALF_UP inside DuckDB) must reproduce the real
    F.round bit-for-bit — pinned on a grid that includes every
    landing class: terminating midpoints at k = n+1 (the divergent
    class), one-ulp near-ties, dyadic ties, cents ties, negatives,
    and non-terminating values. Values flow through COLUMNS on both
    engines, matching the audit's regime: DuckDB constant-folds
    all-literal expressions in exact decimal, so literal probes show
    a different (irrelevant) arithmetic — only the column path is
    what oracles over parquet execute. If a Spark upgrade changes
    F.round's BigDecimal path, this canary fails before the audit
    lies."""
    import math

    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    vals = [(float(f"176.{m:04d}5"), 4) for m in range(0, 4000, 97)]
    vals += [(-float(f"0.{m:06d}5"), 6) for m in range(0, 400000, 9973)]
    # one-ulp near-ties (float arithmetic lands beside a midpoint)
    near = -0.015 + 0.0000005
    vals += [(near, 6), (math.nextafter(near, 0), 6), (-near, 6)]
    vals += [(2.5, 0), (3.5, 0), (-2.5, 0), (901.85, 1), (0.15, 1),
             (0.0096875, 6), (1092.375, 2), (-176.08825, 4)]
    vals += [(1 / 3, 6), (2 / 7, 4), (3.141592653589793, 6)]

    con = duckdb.connect()
    con.execute(
        "CREATE MACRO SPARKR(x, n) AS "
        "CAST(round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)), n) AS DOUBLE)"
    )
    for n in sorted({n for _, n in vals}):
        sub = [v for v, m in vals if m == n]
        df = spark.createDataFrame([(v,) for v in sub], "x double")
        got = {
            r["x"]: r["r"]
            for r in df.select("x", F.round("x", n).alias("r")).collect()
        }
        pdf = pd.DataFrame({"x": sub})
        con.register("probe_vals", pdf)
        for x, emu in con.execute(
            f"SELECT x, SPARKR(x, {n}) FROM probe_vals"
        ).fetchall():
            assert emu == got[x] and str(emu) == str(got[x]), (
                f"emulation drift at ({x!r}, {n}): "
                f"spark={got[x]!r} emu={emu!r}"
            )


def test_struct_immune_ledger_is_current():
    """Every STRUCT_IMMUNE entry must name a registered query — a
    renamed or deleted query must not leave a stale waiver behind."""
    for name in STRUCT_IMMUNE:
        assert name in ORACLES, f"stale STRUCT_IMMUNE entry: {name}"
