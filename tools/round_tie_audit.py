"""Registry-wide ROUND-midpoint hazard audit (r9; the class the
boundary drill caught in events_cusum_changepoint).

The failure class: ``ROUND(x, n)`` where x is an EXACT rational
whose decimal expansion terminates at k > n digits. Such an x can
land exactly ON the n-decimal midpoint, where the engines' ROUNDs
disagree: Spark routes doubles through BigDecimal's shortest-repr
HALF_UP (sees "176.08825", rounds up) while DuckDB multiplies by
10^n in floating point (sees 1760882.4999..., rounds down). On the
driver fixtures this is SYSTEMATIC, not exotic: events / documents /
embeddings / part / supplier row counts are pure 2^a·5^b, so any
cents-sum divided by them terminates — e.g. the original cusum spelt
ROUND(a/10^6, 4), a 1-in-100-per-value coin flip on every fixture
regen. Values that do NOT terminate (denominators with other prime
factors, or genuinely float-valued math) cannot tie: the double sits
off the midpoint and both engines agree.

The audit runs every oracle with ``ROUND(`` textually swapped for a
probe macro that POISONS (returns 1e99) any value that terminates
beyond its rounding scale — i.e. x·10^n is not integral but x·10^8
is. A poisoned output means the query's rounding site is structurally
capable of a midpoint landing regardless of whether today's bytes
tie; fix it with an exact-integer rounding spelling (the cusum
``div`` path, streaming_batch.py) or FLOOR(x·10^n + 0.5) on both
sides when the doubles are engine-identical (udfs.py centroid).

A false positive requires an inexact computation to land exactly on
m/10^8 by chance (~2^-30 per value) — treat any flag as real first.

Usage: python tools/round_tie_audit.py [sf_dir] [name_filter ...]
Exit 1 if any query poisons.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

from hbase_support_spark import ORACLES, load_all
from hbase_support_spark.parity import duckdb_connect

# Terminating-decimal test via the double's shortest roundtrip repr
# (what DuckDB prints for VARCHAR casts): x "terminates at k digits"
# iff the repr's fraction has k digits. A multiply-based test
# (x*1e8 integral) false-positives at magnitude >~1e3 where the
# product's ulp exceeds 1, so integrality happens by luck.
_MACRO_STRUCT = """
CREATE OR REPLACE MACRO R9PROBE(x, n) AS CASE
  WHEN x IS NULL THEN NULL
  WHEN NOT contains(CAST(x AS VARCHAR), 'e')
   AND length(split_part(CAST(x AS VARCHAR), '.', 2)) > n
   AND length(split_part(CAST(x AS VARCHAR), '.', 2)) <= 8
  THEN 1e99
  ELSE round(x, n)
END
"""

# Spark's F.round(double, n) routes through BigDecimal.valueOf,
# i.e. exact decimal HALF_UP of the double's SHORTEST decimal repr.
# DuckDB prints exactly that shortest repr for VARCHAR casts, and
# DECIMAL rounding is exact half-away-from-zero — so the Spark result
# is computable INSIDE DuckDB, and the probe poisons only when the
# two engines would actually emit different doubles for this value.
_MACRO_DIVERGE = """
CREATE OR REPLACE MACRO R9PROBE(x, n) AS CASE
  WHEN x IS NULL THEN NULL
  WHEN abs(x) < 1e15
   AND CAST(round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)), n)
            AS DOUBLE) <> round(x, n)
  THEN 1e99
  ELSE round(x, n)
END
"""


# Justified exemptions from the STRUCTURAL probe — sites whose values
# can terminate beyond their ROUND scale but where actual divergence
# is unreachable (the divergence probe stays armed for all of them;
# an exemption only silences the advisory structural flag).
# Reachability law, measured empirically (see git history r9): the
# engines disagree only when the value terminates at EXACTLY n+1
# digits AND the x·10^n product's representation error crosses
# half-ulp — which needs specific magnitude windows.
STRUCT_IMMUNE: dict[str, str] = {
    "fn_math": "price_r1 rounds cents at n=1; at n=1 the product "
    "error never crosses half-ulp at any price magnitude (measured "
    "0/80k midpoints across 4 decades)",
    "agg_cellcount": "ROUND(SUM(double),2) under the num.py "
    "small-magnitude judgment; a drift landing needs k=3 exactly "
    "ending in 5 — measure ~0, and the divergence probe gates it",
    "events_anova_f_oneway": "cents-integer sums of squares at "
    "magnitude 1e4..1e7 where the n=6 product error stays under "
    "half-ulp; denominators are event-type counts",
    "embedding_pca_power_top1": "eigval ratio num·2^20/den with "
    "arbitrary integer den — terminating landings are coincidental "
    "and the magnitude (~1e5) is outside the n=6 divergence window",
    "fn_array": "float32 components snapped to k/64 by the boundary "
    "drill terminate at <=6 digits, so ROUND(,6) is the identity",
    "sim_maxsim_multivector": "same k/64 boundary-drill artifact as "
    "fn_array: partial dot products terminate at <=6 digits",
}


def _sweep(con, todo, macro, tag, immune=()):
    con.execute(macro)
    flagged, errored = [], []
    for name in todo:
        t0 = time.time()
        sql = ORACLES[name].replace("ROUND(", "R9PROBE(")
        try:
            rows = con.execute(sql).fetchall()
            poisoned = any(
                isinstance(v, float) and math.isfinite(v) and v == 1e99
                for row in rows
                for v in row
            )
        except Exception as e:  # noqa: BLE001
            # a handful of oracles nest ROUND inside constructs the
            # macro can't sit in (e.g. as a window-frame bound) —
            # report, never silently skip
            errored.append(name)
            print(f"ERR  {name:36s} {type(e).__name__}: {str(e)[:120]}")
            continue
        if poisoned and name in immune:
            print(f"immu {name:36s} {time.time() - t0:5.2f}s  exempt: {immune[name][:60]}")
            continue
        print(
            f"{'FLAG' if poisoned else 'pass'} {name:36s} "
            f"{time.time() - t0:5.2f}s  {tag if poisoned else 'ok'}"
        )
        if poisoned:
            flagged.append(name)
    return flagged, errored


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    load_all()
    con = duckdb_connect(sf_dir)
    todo = [
        n
        for n in ORACLES
        if (not names or any(f in n for f in names)) and "ROUND(" in ORACLES[n]
    ]
    print(f"== divergence probe (engines WOULD disagree on today's bytes) ==")
    diverged, err1 = _sweep(con, todo, _MACRO_DIVERGE, "DIVERGE")
    print(f"\n== structural probe (value terminates beyond its ROUND scale) ==")
    structural, err2 = _sweep(con, todo, _MACRO_STRUCT, "TIE-HAZARD", STRUCT_IMMUNE)
    errored = sorted(set(err1) | set(err2))
    print(
        f"\n{len(todo)} audited: {len(diverged)} DIVERGED, "
        f"{len(structural)} structural tie-hazards, {len(errored)} errored"
    )
    if diverged:
        print("DIVERGED (fix now):", ", ".join(diverged))
    if structural:
        print("structural (exact-spelling candidates):", ", ".join(structural))
    if errored:
        print("errored (inspect manually):", ", ".join(errored))
    if diverged:
        sys.exit(1)


if __name__ == "__main__":
    main()
