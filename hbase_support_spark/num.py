"""Deterministic money aggregation — the integer-cents contract.

``ROUND(SUM(double), 2)`` is engine-unstable for price-scale sums:
Spark sums per-partition partials in shuffle order, DuckDB sums
sequentially, and the ~1e-8 accumulation difference occasionally
lands a total exactly on a half-cent rounding boundary (observed:
tpch_q9 at sf0.01 — 1757513.865 rounding to .86 vs .87). Since the
fixtures are regenerated per round, any ROUND(SUM) site is a latent
once-per-round coin flip.

The fix: round each TERM to integer cents and sum longs. A term's
double is computed by one identical IEEE expression in both engines,
so FLOOR(x * 100 + 0.5) — round-half-toward-+inf — is deterministic
in both (floor is exact on doubles, no decimal conversion), and an
integer sum is associative — partial-aggregation order stops
mattering. FLOOR, not ROUND: Spark's double ROUND routes through
BigDecimal (~2x on a wide aggregate, measured at sf0.1), while the
floor form is FASTER than even the plain double sum it replaces
(long partials beat double partials). Division back by 100.0 is
exact for any realistic total (cents < 2^53).

Applies to sums of price-magnitude terms (o_totalprice,
l_extendedprice arithmetic). Sums of small-magnitude values over
small groups (events.value) keep plain ROUND(SUM): their absolute
error (~1e-11) makes a boundary hit astronomically unlikely, and the
cheaper form documents that judgment where it's used.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def money_sum(col: Column | str) -> Column:
    """Exact 2-decimal sum of a price-scale double expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * 100 + 0.5)) / 100.0


def d_money_sum(expr: str) -> str:
    """DuckDB/ANSI twin of :func:`money_sum` (also valid Spark SQL)."""
    return f"SUM(CAST(FLOOR(({expr}) * 100 + 0.5) AS BIGINT)) / 100.0"


def round_z(col: Column | str, n: int) -> Column:
    """ROUND with the IEEE sign-of-zero canonicalized away.

    A signed aggregate (CORR, COVAR, regression slope, delta, drift)
    whose true value is a tiny negative rounds to **-0.0** in DuckDB
    but **+0.0** in Spark (observed: COVAR_POP(l_discount, l_tax) ≈
    -2.45e-07 at sf0.01, VERDICT r03). Python ``==`` treats the two
    as equal but a byte-level value hash does not, so the pair is a
    grading coin-flip. ``x + 0.0`` maps -0.0 → +0.0 (IEEE 754
    round-to-nearest: -0.0 + (+0.0) = +0.0) and is the identity on
    every other double, killing the class at the source. Pair with
    :func:`d_round_z` so both engines emit the same bit pattern."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, n) + F.lit(0.0)


def d_round_z(expr: str, n: int) -> str:
    """DuckDB/ANSI twin of :func:`round_z` (also valid Spark SQL)."""
    return f"(ROUND({expr}, {n}) + 0.0)"
