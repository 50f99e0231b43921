"""Registry-wide sign-of-zero / rounding-fragility audit.

The round-3 failure class: a signed float aggregate whose true value
is a tiny negative ROUNDs to IEEE **-0.0** in DuckDB but **+0.0** in
Spark; Python ``==`` is blind but the driver's value hash is not
(VERDICT r03, ``agg_corr_covar``). Fixtures are regenerated every
round, so a query whose outputs merely *can* straddle zero is a
latent per-round coin flip even when today's data agrees.

This audit runs every oracle (DuckDB executes; that alone covers the
rounded column the Spark side mirrors bit-for-bit under the strict
parity sweep) and flags, per float column:

  * HARD  — any cell is IEEE -0.0: a sign-of-zero guard is missing
            NOW (fix with num.round_z / d_round_z or integer units).
  * FRAGILE — the column contains BOTH negative values and exact
            zeros: a regenerated fixture can move a tiny negative
            onto the zero boundary, producing -0.0 on one engine
            only. These columns should round through round_z.

Exit 1 on HARD findings; FRAGILE is reported for review (some zeros
are structural, e.g. a count-derived ratio that is exactly 0 for an
empty group on both engines — those cannot produce -0.0 because no
negative path feeds them, which is why the flag requires negatives
in the same column).

Usage: python tools/zero_sign_audit.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import math
import re
import sys
import time

sys.path.insert(0, ".")

from hbase_support_spark import load_all, QUERIES, ORACLES
from hbase_support_spark.parity import duckdb_connect


def _is_float(v) -> bool:
    return isinstance(v, float)


def guarded_cols(oracle_sql: str) -> set[str]:
    """Columns whose defining expression ends in the ``+ 0.0``
    sign-of-zero guard (the d_round_z convention): those cannot emit
    -0.0, so a neg+zero mix in them is not fragile. The guard may be
    separated from its ``AS alias`` by closing parens and/or a CASE
    ``END`` (e.g. ``(ROUND(...) + 0.0) END AS survival``)."""
    return {
        m.group(1)
        for m in re.finditer(
            r"\+\s*0\.0[\s)]*(?:END[\s)]*)*AS\s+(\w+)", oracle_sql, re.I
        )
    }


def audit_rows(cols, rows) -> tuple[list[str], list[str]]:
    """Return (hard, fragile) column-level findings for one result."""
    neg = set()
    zero = set()
    hard = set()
    for row in rows:
        for c, v in zip(cols, row):
            if not _is_float(v) or math.isnan(v):
                continue
            if v == 0.0:
                zero.add(c)
                if math.copysign(1.0, v) < 0:
                    hard.add(c)
            elif v < 0.0:
                neg.add(c)
    fragile = (neg & zero) - hard
    return sorted(hard), sorted(fragile)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    load_all()
    con = duckdb_connect(sf_dir)
    todo = [
        n for n in QUERIES if n in ORACLES and (not names or any(f in n for f in names))
    ]
    hard_hits: dict[str, list[str]] = {}
    fragile_hits: dict[str, list[str]] = {}
    t0 = time.time()
    for name in todo:
        try:
            rel = con.execute(ORACLES[name])
            cols = [d[0] for d in rel.description]
            rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            hard_hits[name] = [f"EXCEPTION: {type(e).__name__}: {str(e)[:200]}"]
            print(f"ZERO-SIGN HARD {name}: {hard_hits[name][0]}")
            continue
        hard, fragile = audit_rows(cols, rows)
        fragile = [c for c in fragile if c not in guarded_cols(ORACLES[name])]
        if hard:
            hard_hits[name] = hard
            print(f"ZERO-SIGN HARD    {name}: -0.0 in {hard}")
        if fragile:
            fragile_hits[name] = fragile
            print(f"ZERO-SIGN FRAGILE {name}: neg+zero in {fragile}")
    n_clean = len(todo) - len(hard_hits) - len(fragile_hits)
    print(
        f"\n{n_clean}/{len(todo)} clean, {len(fragile_hits)} fragile, "
        f"{len(hard_hits)} hard in {time.time() - t0:.1f}s"
    )
    if hard_hits:
        print("hard:", ", ".join(hard_hits))
        sys.exit(1)


if __name__ == "__main__":
    main()
