"""Static sweep: no Python-side banker's rounding in kernels.

The round_tie_audit probes run INSIDE DuckDB over the oracle text, so
they see every SQL ROUND — but a Python ``round()`` (or numpy/pandas
``.round()``) inside a mapInPandas/applyInPandas kernel is invisible
to them, and Python rounds ties-to-even while every SQL oracle rounds
HALF_UP. Two graded queries have now been caught with exactly this
defect (udaf_centroid_per_label in r9, multimodal_feature_extract in
r10 — ADVICE r9 item 1): a k/2^32 or mean-of-k/64 value terminating
exactly ON the rounding-scale midpoint diverges from the oracle on
some fixture regen. Kernels must use the shared FLOOR(x*10^n + 0.5)
spelling (num.round_ie's formula) instead.

This sweep AST-walks every engine module and fails on any builtin
``round(`` call or non-``F.round`` attribute ``.round(`` call, minus
an explicit per-function exemption ledger. AST, not grep: string
literals (Spark SQL ``round(...)`` inside ``F.expr`` — audited by the
SQL-side probes) and docstrings never false-positive.
"""

from __future__ import annotations

import ast
import pathlib

ENGINE = pathlib.Path(__file__).resolve().parent.parent / "hbase_support_spark"

# (file relative to engine root, enclosing function) -> why it's safe
EXEMPT: dict[tuple[str, str], str] = {
    ("operators/llm.py", "_lcg_planes"): (
        "driver-side constant generator: the rounded hyperplane "
        "components are formatted into BOTH engines' SQL as identical "
        "%.6f literals, so no cross-engine rounding comparison exists"
    ),
}


def _enclosing_functions(tree: ast.Module) -> list[tuple[int, int, str]]:
    spans = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            spans.append((node.lineno, node.end_lineno or node.lineno, node.name))
    return spans


def _func_at(spans, lineno: int) -> str:
    best = "<module>"
    best_len = None
    for lo, hi, name in spans:
        if lo <= lineno <= hi and (best_len is None or hi - lo < best_len):
            best, best_len = name, hi - lo
    return best


def test_no_python_round_in_engine():
    offenders = []
    for p in sorted(ENGINE.rglob("*.py")):
        tree = ast.parse(p.read_text())
        spans = _enclosing_functions(tree)
        rel = str(p.relative_to(ENGINE))
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            f = node.func
            hit = None
            if isinstance(f, ast.Name) and f.id == "round":
                hit = "builtin round()"
            elif isinstance(f, ast.Attribute) and f.attr == "round":
                base = f.value
                if not (isinstance(base, ast.Name) and base.id == "F"):
                    hit = ".round() (numpy/pandas ties-to-even)"
            if hit is None:
                continue
            fn = _func_at(spans, node.lineno)
            if (rel, fn) in EXEMPT:
                continue
            offenders.append(f"{rel}:{node.lineno} in {fn}: {hit}")
    assert not offenders, (
        "Python-side ties-to-even rounding in engine code (use the "
        "FLOOR(x*10^n + 0.5) spelling, see num.round_ie):\n  "
        + "\n  ".join(offenders)
    )


def test_exemption_ledger_is_live():
    """Every exemption must still point at a real (file, function) —
    a stale entry would silently widen the sweep's blind spot."""
    for (rel, fn), _why in EXEMPT.items():
        p = ENGINE / rel
        assert p.exists(), f"exempt file gone: {rel}"
        tree = ast.parse(p.read_text())
        names = {
            n.name
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }
        assert fn in names, f"exempt function gone: {rel}:{fn}"
