"""The engine's SQL surface: register_views mirrors the oracle's
view names 1:1, so users can run plain Spark SQL text against the
same tables (SURVEY.md §3.2 entry point 3)."""

from __future__ import annotations

from hbase_support_spark.io import register_views


def test_sql_over_registered_views(spark, sf_dir):
    register_views(spark, sf_dir)
    row = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS cnt
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY cnt DESC, n_name LIMIT 1
        """
    ).collect()[0]
    assert row.cnt >= 1


def test_sql_events_shim_applied(spark, sf_dir):
    register_views(spark, sf_dir)
    row = spark.sql("SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events").collect()[0]
    assert row.lo.year == 2024 and row.hi.year == 2024
