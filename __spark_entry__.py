"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``hbase_support_spark/`` (one module per
SURVEY.md §2 family); this file is a thin view over its registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbase_support_spark import registry
from hbase_support_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the 6-table star join (SURVEY.md §6/§7 step 1):
    scan → pushed filter → broadcast dims → sort-merge fact join →
    partial+final agg.
    """
    load_all()
    return registry.QUERIES["join_multiway_star"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL twin for every registered query — the full
    registry is hash-gradable (sketch/hash-defined ops restate the
    same portable arithmetic; see hashutil.py and num.py)."""
    load_all()
    return dict(registry.ORACLES)
