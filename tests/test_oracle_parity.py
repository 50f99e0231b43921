"""Differential oracle parity — replicates the driver's t2 gate
locally at sf0.001 (SURVEY.md §5.2): every registered query vs its
DuckDB oracle, order-insensitive value compare."""

from __future__ import annotations

import pytest

from hbase_support_spark import QUERIES, ORACLES, load_all
from hbase_support_spark.parity import compare

load_all()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, oracle_con):
    df = QUERIES[name](spark, sf_dir)
    ok, detail = compare(df, ORACLES[name], oracle_con)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
