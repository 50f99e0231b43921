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


def test_semantic_views_match_kernels(spark, sf_dir):
    """The SQL semantic layer equals the graded DataFrame kernels."""
    from hbase_support_spark import registry
    from hbase_support_spark.io import register_semantic_views

    register_semantic_views(spark, sf_dir)

    lat_sql = {
        (r.user_id, r.event_type): r.latest_value
        for r in spark.sql("SELECT * FROM cells_latest").collect()
    }
    lat_df = registry.QUERIES["latest_version"](spark, sf_dir).collect()
    for r in lat_df:
        assert lat_sql[(r["user_id"], r["event_type"])] is not None
    assert len(lat_sql) == len(lat_df)

    live_cnt = spark.sql("SELECT COUNT(*) AS c FROM cells_live").collect()[0].c
    assert live_cnt == registry.QUERIES["tombstone_merge"](spark, sf_dir).count()

    n_sessions = spark.sql("SELECT COUNT(*) AS c FROM sessions_30m").collect()[0].c
    assert n_sessions == registry.QUERIES["stream_session_30m"](spark, sf_dir).count()

    tok = spark.sql(
        "SELECT COUNT(*) AS c, COUNT(DISTINCT word) AS w FROM doc_tokens"
    ).collect()[0]
    assert tok.c > 0 and tok.w > 0
    # pushdown sanity: a filtered view read prunes to the documents scan
    one = spark.sql("SELECT word FROM doc_tokens WHERE doc_id = 1 AND pos = 0")
    assert len(one.collect()) <= 1
