"""The harness-blindness regression pack.

Two rounds in a row the local parity harness said PASS while the
driver's value hash said FAIL, each time for a float *representation*
nuance Python ``==`` cannot see:

  * r02 — numeric KIND (DuckDB SUM(int)->HUGEINT vs Spark BIGINT,
    0 vs 0.0) — closed by the kind gate (test_kind_parity.py).
  * r03 — SIGN OF ZERO: DuckDB ROUND(COVAR_POP(...),6) -> IEEE -0.0,
    Spark -> +0.0; round-tripped floats compared equal locally but
    hashed differently in the driver.

These tests pin the fix: ``parity._norm_cell`` now encodes floats as
their raw little-endian IEEE-754 bits, so ANY representation
difference — sign of zero, one-ulp drift, ROUND-boundary flip — is a
local FAIL first. Injecting the historical failure modes must fail.
"""

from __future__ import annotations

import math

from hbase_support_spark.num import d_round_z, round_z  # noqa: F401
from hbase_support_spark.parity import _norm_cell, _normalize


def test_negative_zero_distinguished():
    # the r03 agg_corr_covar failure mode, injected directly
    assert _norm_cell(-0.0) != _norm_cell(0.0)


def test_one_ulp_distinguished():
    x = 0.1
    y = math.nextafter(x, 1.0)
    assert x != y and _norm_cell(x) != _norm_cell(y)


def test_round_boundary_flip_distinguished():
    # the tpch_q9 class: same total rounded differently by each engine
    assert _norm_cell(1757513.86) != _norm_cell(1757513.87)


def test_equal_bits_equal_encoding():
    assert _norm_cell(2.5) == _norm_cell(2.5)
    assert _norm_cell(float("nan")) == _norm_cell(float("nan"))
    # integral float is NOT collapsed to the int encoding (kind-faithful)
    assert _norm_cell(7.0) != _norm_cell(7)


def test_normalize_rowsets_diverge_on_sign_of_zero():
    a = _normalize(["g", "v"], [("N", 0.0)])
    b = _normalize(["g", "v"], [("N", -0.0)])
    assert a != b


def test_round_z_kills_negative_zero_in_python_semantics():
    # IEEE: -0.0 + 0.0 == +0.0 under round-to-nearest — the helper's
    # whole contract. (Engine-side behavior is covered by the
    # agg_corr_covar parity run; this pins the arithmetic identity.)
    v = round(-2.45e-07, 6)  # -0.0
    assert math.copysign(1.0, v) < 0
    assert math.copysign(1.0, v + 0.0) > 0
    assert d_round_z("x", 6) == "(ROUND(x, 6) + 0.0)"


def test_duckdb_round_z_canonicalizes(oracle_con):
    row = oracle_con.execute(
        "SELECT ROUND(-2.45e-7, 6) AS raw, (ROUND(-2.45e-7, 6) + 0.0) AS guarded"
    ).fetchone()
    assert math.copysign(1.0, row[0]) < 0  # DuckDB really emits -0.0
    assert math.copysign(1.0, row[1]) > 0  # the guard really fixes it
    assert _norm_cell(row[1]) == _norm_cell(0.0)


def test_zero_sign_audit_registry_wide(oracle_con):
    """Every oracle's sf0.001 output is free of -0.0 cells (HARD) and
    of unguarded neg+zero float columns (FRAGILE). Runs DuckDB only:
    under the strict bit-level parity sweep the Spark side must mirror
    these bits anyway, so one engine suffices for the fragility scan."""
    import sys

    sys.path.insert(0, ".")
    from tools.zero_sign_audit import audit_rows, guarded_cols

    from hbase_support_spark import ORACLES, QUERIES, load_all

    load_all()
    findings = {}
    for name in QUERIES:
        if name not in ORACLES:
            continue
        rel = oracle_con.execute(ORACLES[name])
        cols = [d[0] for d in rel.description]
        rows = rel.fetchall()
        hard, fragile = audit_rows(cols, rows)
        fragile = [c for c in fragile if c not in guarded_cols(ORACLES[name])]
        if hard or fragile:
            findings[name] = {"hard": hard, "fragile": fragile}
    assert not findings, f"zero-sign risk in {len(findings)} queries: {findings}"


def test_audit_rows_detects_both_classes():
    hard, fragile = audit_rows_ref(["a", "b", "c"], [(-0.0, 0.0, 1.0), (1.0, -2.0, 0.5)])
    assert hard == ["a"] and fragile == ["b"]


def audit_rows_ref(cols, rows):
    import sys

    sys.path.insert(0, ".")
    from tools.zero_sign_audit import audit_rows

    return audit_rows(cols, rows)
