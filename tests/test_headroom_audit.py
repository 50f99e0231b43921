"""r10 int64-headroom audit — pinned regressions.

The class (found via ADVICE r9 item 2 / events_cusum_changepoint, then
audited registry-wide): a Spark-side int64 accumulation or product of
two scale-dependent quantities (Σv², Σ(count·count), rank·total,
cum·N) silently wraps (ANSI off) or raises (ANSI on) past 2^63, while
the DuckDB oracle's SUM(BIGINT) promotes to HUGEINT — so the defect is
invisible at grading scale and fatal at 100-TB scale. Fifteen queries
were respelled to carry those accumulations in DECIMAL(38,0) (or do
the product in double where the output is float anyway).

Two test layers:
- END-TO-END: adversarial fixtures whose per-row products stay under
  2^63 (so the DuckDB oracle's BIGINT multiply still works) but whose
  accumulated sums cross it — the old long-sum spelling dies with
  ARITHMETIC_OVERFLOW under ANSI; the decimal spelling must match the
  HUGEINT oracle exactly.
- SOURCE PIN: the count-driven queries (KS, U, CUPED, t-closeness)
  cannot be stressed without ~1e10 rows, so the decimal spelling in
  their source is asserted directly.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hbase_support_spark import QUERIES, ORACLES, load_all
from hbase_support_spark.parity import compare, duckdb_connect

load_all()  # the source-pin tests don't touch the spark fixture


BASE_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _mk_sf(tmp_path_factory, name: str, events_sql: str) -> str:
    """A fixture dir = BASE_SF_DIR tables with events replaced by the
    given SELECT (columns: event_id, ts, user_id, event_type, value,
    props). Base dir honors SPARK_GRAFT_TEST_SF_DIR like the rest of
    the suite (ADVICE r10 item 4)."""
    d = tmp_path_factory.mktemp(name)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        shutil.copy(os.path.join(BASE_SF_DIR, f"{t}.parquet"), d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(f"COPY ({events_sql}) TO '{d}/events.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


def _stress(spark, sf: str, name: str):
    con = duckdb_connect(sf)
    df = QUERIES[name](spark, sf)
    ok, detail = compare(df, ORACLES[name], con)
    con.close()
    assert ok, f"{name}: {detail}"


@pytest.fixture(scope="module")
def whale_purchases_sf(tmp_path_factory):
    """20 users, one $30M purchase each (x_cents = 3e9 per user, so
    x_cents^2 = 9e18 fits a single BIGINT multiply in the oracle) plus
    clicks; Σ x_cents^2 = 1.8e20 >> 2^63 — the old long accumulation
    in the delta-method CI raises/wraps, decimal must not."""
    return _mk_sf(
        tmp_path_factory,
        "whale_sf",
        """
        SELECT i AS event_id,
               TIMESTAMP '2024-01-01' + INTERVAL (i * 60) SECOND AS ts,
               i % 20 AS user_id,
               CASE WHEN i < 20 THEN 'purchase' ELSE 'click' END AS event_type,
               CASE WHEN i < 20 THEN 3e7 ELSE 1.0 END AS value,
               '{}' AS props
        FROM range(200) r(i)
        """,
    )


def test_delta_ci_survives_whale_revenue(spark, whale_purchases_sf):
    _stress(spark, whale_purchases_sf, "events_ratio_metric_delta_ci")


def test_anova_survives_whale_values(spark, whale_purchases_sf):
    # q_g = sum v^2 with v = 3e9 cents on 20 rows -> 1.8e20 > 2^63
    _stress(spark, whale_purchases_sf, "events_anova_f_oneway")


@pytest.fixture(scope="module")
def sparse_whale_sf(tmp_path_factory):
    """One user, 2000 events of $10M value spaced 1e7 s apart:
    cents*dur_s = 1e9 * 1e7 = 1e16 per segment (oracle-safe), summed
    over 2000 segments = 2e19 > 2^63 — stresses the TWAP accumulator.
    Gaps of 1e7 s also stress the bot-cadence Σgap² (1e14 per row,
    2e17 total — decimal path exercised, though below the int64 line
    at this row count)."""
    return _mk_sf(
        tmp_path_factory,
        "sparse_whale_sf",
        """
        SELECT i AS event_id,
               TIMESTAMP '2024-01-01' + INTERVAL (i * 10000000) SECOND AS ts,
               7 AS user_id,
               'click' AS event_type,
               1e7 AS value,
               '{}' AS props
        FROM range(2000) r(i)
        """,
    )


def test_twap_survives_long_segments(spark, sparse_whale_sf):
    _stress(spark, sparse_whale_sf, "win_time_weighted_avg")


def test_bot_cadence_survives_long_gaps(spark, sparse_whale_sf):
    _stress(spark, sparse_whale_sf, "events_bot_cadence_score")


# ---------------------------------------------------------------- source pins

# query -> module attribute holding it (all registered via @register,
# so inspect the registered callable's source)
_DECIMAL_PINNED = [
    "events_ratio_metric_delta_ci",
    "events_cuped_adjustment",
    "events_kstest_arms",
    "events_mannwhitney_arms",
    "privacy_t_closeness",
    "events_anova_f_oneway",
    "orders_abc_xyz_matrix",
    "events_autocorr_lag1",
    "win_ulcer_index",
    "win_time_weighted_avg",
    "events_bot_cadence_score",
    "text_heaps_law_fit",
    "graph_degree_assortativity",
    "events_cusum_changepoint",
]


@pytest.mark.parametrize("name", _DECIMAL_PINNED)
def test_decimal_headroom_spelling_pinned(name):
    """The count-driven members of the class can't be stressed below
    ~1e10 rows, so pin the decimal spelling in the source: if someone
    reverts an accumulator to a bare long sum, this fails with a
    pointer to the audit."""
    import inspect

    src = inspect.getsource(QUERIES[name])
    assert "decimal(" in src.lower(), (
        f"{name} lost its DECIMAL(38,0) accumulation — see the r10 "
        "int64-headroom audit (tests/test_headroom_audit.py docstring)"
    )


def test_chisq_expected_counts_in_double():
    """agg_chisq_independence computes expected counts as
    double-first (row_tot.cast(double) * col_tot), never a raw
    long*long product that overflows at ~3e9-count margins."""
    import inspect

    src = inspect.getsource(QUERIES["agg_chisq_independence"])
    assert 'F.col("row_tot").cast("double")' in src


def test_basket_lift_denominator_in_double():
    import inspect

    src = inspect.getsource(QUERIES["basket_copurchase_lift"])
    assert 'F.col("cnt_a").cast("double")' in src
