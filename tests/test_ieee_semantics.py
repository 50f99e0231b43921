"""DuckDB dual-semantics canary (VERDICT r10 item 6).

parity.duckdb_connect pins ``ieee_floating_point_ops=false`` and fails
loudly if x/0 stops returning NULL. The next hardening level: every
oracle containing a division should produce IDENTICAL results under
BOTH division semantics (i.e. no result row ever rides an unguarded
float x/0), so a DuckDB upgrade is a non-event rather than a
re-audit.

The sandbox ships duckdb 1.0.0, which predates the knob — there the
dual-run SKIPS (recorded, not hidden) and the existing pin tests in
test_r10_advice.py keep guarding. The moment a >=1.1 duckdb lands,
this file runs the full class under IEEE semantics automatically.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from hbase_support_spark import ORACLES, load_all
from hbase_support_spark.io import TABLES

load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _knob_supported() -> bool:
    con = duckdb.connect()
    try:
        con.execute("SET ieee_floating_point_ops=true")
        return True
    except duckdb.Error:
        return False
    finally:
        con.close()


def _con(ieee: bool) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"SET ieee_floating_point_ops={'true' if ieee else 'false'}")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


# Every oracle containing a division is in scope: the IEEE flip only
# changes float x/0, and which denominators can hit 0 is exactly what
# a static audit cannot prove — so run them all when the knob exists.
DIV_CLASS = sorted(n for n, sql in ORACLES.items() if "/" in sql)


def test_div_zero_class_is_nonempty():
    # the class this file guards must keep existing — if it shrinks to
    # nothing the canary is dead and someone should notice
    assert len(DIV_CLASS) >= 100, len(DIV_CLASS)


# one skip, not |DIV_CLASS| skips, when the knob predates the duckdb
_SKIP = pytest.param(
    DIV_CLASS[0],
    marks=pytest.mark.skip(
        reason="duckdb predates ieee_floating_point_ops (1.0.0 in "
        "sandbox); NULL division semantics are the only mode — the pin "
        "tests in test_r10_advice.py cover it"
    ),
    id="knob-unsupported",
)


@pytest.mark.parametrize("name", DIV_CLASS if _knob_supported() else [_SKIP])
def test_guarded_oracles_identical_under_both_semantics(name):
    a = _con(False)
    b = _con(True)
    try:
        ra = a.execute(ORACLES[name]).fetchall()
        rb = b.execute(ORACLES[name]).fetchall()
    finally:
        a.close()
        b.close()
    assert ra == rb, (
        f"{name}: oracle diverges between NULL and IEEE division "
        "semantics — an unguarded x/0 slipped past the NULLIF audit"
    )
