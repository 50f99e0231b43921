"""Physical data layout for 100-TB tables — the storage-side half of
the engine (SURVEY.md §1.1: rowkey-sorted storage → sorted/bucketed
Parquet).

HBase gets its access paths from rowkey-sorted regions; the Spark
equivalents are:

  * **Key-sorted Parquet** (`write_sorted_by_key`): repartitionByRange
    + sortWithinPartitions on the rowkey → row-group min/max stats
    become a rowkey index, so `scan_range`/`point_get` predicates
    skip row groups (and whole files) instead of scanning.
  * **Bucketed tables** (`write_bucketed`): hash-bucket both fact
    tables on the join key → bucket-aware scans let joins and
    aggregations on that key run with NO shuffle (the Exchange
    disappears from the plan — asserted in tests/test_layout.py).
    This is the partition-per-region idea as a join strategy.
  * **Parquet bloom filters** (write option): qualifier-level point
    lookups on unsorted columns — the HFile bloom filter analog.

At 100 TB these writers run once per ingest; every downstream query
inherits the pruning/co-location for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_sorted_by_key(df: DataFrame, path: str, key: str, n_files: int = 8) -> None:
    """Rowkey-sorted layout: range-partition then sort within files so
    parquet row-group min/max form a monotone key index."""
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#" + key, "true")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_key: str | None = None,
) -> None:
    """Hash-bucketed table (Hive-style layout in spark-warehouse).

    Joins/aggregations keyed on ``bucket_key`` between tables with
    the same bucket count read co-located buckets and skip the
    shuffle entirely.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    w = w.sortBy(sort_key or bucket_key)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — compiles
    to SortMergeJoin with zero shuffle Exchange on either side.

    The merge hint matters at toy scale: the planner would broadcast
    tiny tables (and skip bucketed scans entirely); at 100 TB both
    sides are fact tables and SMJ-over-buckets is the plan you want
    demonstrated."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.hint("merge").join(rt, key)
