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


def test_struct_immune_ledger_is_current():
    """Every STRUCT_IMMUNE entry must name a registered query — a
    renamed or deleted query must not leave a stale waiver behind."""
    for name in STRUCT_IMMUNE:
        assert name in ORACLES, f"stale STRUCT_IMMUNE entry: {name}"
