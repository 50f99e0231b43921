"""TPC-H suite: the SQL text entry point plans the ORIGINAL subquery
forms (EXISTS / NOT EXISTS / IN-with-HAVING / correlated and
uncorrelated scalar subqueries) — Catalyst's decorrelation rewrites
produce the same results as the module's explicit DataFrame
compositions. The oracle SQL doubles as the Spark SQL text: it is
deliberately ANSI (no DuckDB-isms) for exactly this reason.
"""

from __future__ import annotations

import pytest

from hbase_support_spark import QUERIES, ORACLES, load_all
from hbase_support_spark.io import register_views
from hbase_support_spark.parity import _normalize

load_all()

TPCH = sorted(n for n in QUERIES if n.startswith("tpch_"))


@pytest.mark.parametrize("name", TPCH)
def test_sql_text_matches_dataframe_form(name, spark, sf_dir):
    register_views(spark, sf_dir)
    df_rows = QUERIES[name](spark, sf_dir).collect()
    sql_df = spark.sql(ORACLES[name])
    sql_rows = sql_df.collect()
    df_cols = QUERIES[name](spark, sf_dir).columns
    assert sorted(df_cols) == sorted(sql_df.columns)
    assert _normalize(df_cols, [tuple(r) for r in df_rows]) == _normalize(
        sql_df.columns, [tuple(r) for r in sql_rows]
    )
