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


def test_every_query_has_an_oracle():
    """All 210 registered queries carry a full SQL oracle (round 2
    restructured the last rows-only ones); a regression to rows-only
    grading should be a deliberate choice, not an accident."""
    assert set(QUERIES) == set(ORACLES)
