"""Plan hygiene over the ENTIRE registry: no accidental cartesian
products and no row-at-a-time Python evaluation anywhere (SURVEY.md
§4 — UDFs must be Arrow-batched). Analysis-only: plans are inspected
without executing, so this sweeps all queries in seconds."""

from __future__ import annotations

import pytest

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.plans.explain import formatted_plan

load_all()

# queries whose *physical* plan legitimately contains a broadcast
# nested loop (tiny literal side) — never a CartesianProduct though
_THETA = {"join_range_theta"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_no_row_python(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    # BatchEvalPython = row-at-a-time Python UDF; Arrow paths show
    # ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas instead
    assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"
