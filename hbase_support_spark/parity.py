"""Local differential-oracle harness.

Replicates the driver's comparison (SURVEY.md §5.1) so parity breaks
are caught before the per-round verify: run the Spark query and the
DuckDB oracle SQL on the same sf dir, normalize, and compare
order-insensitively.

Normalization: columns sorted by name, floats rounded to 6 (queries
additionally ROUND themselves — this is belt-and-braces), timestamps
to ISO-µs strings, rows sorted lexicographically.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from .io import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == int(r):
            return str(int(r))
        return repr(r)
    if isinstance(v, datetime.datetime):
        return v.isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _normalize(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def compare(spark_df, oracle_sql: str, con: duckdb.DuckDBPyConnection) -> tuple[bool, str]:
    """Return (match, detail). Mirrors the driver's row-count + schema
    (column names) + order-insensitive value comparison."""
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = con.execute(oracle_sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    sn = _normalize(s_cols, [tuple(r) for r in s_rows])
    dn = _normalize(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch; first diffs (spark vs duckdb): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
