"""Secondary-index emulation — the HBase support-tooling move.

HBase has exactly one index: the rowkey. Querying by any other
column is a full scan, so support tooling maintains *index tables*
mapping indexed-column values back to rowkeys. The same pattern in
Spark/Parquet:

  index_build   -> write (indexed_value, rowkey) pairs partitioned
                   by a bucket of the indexed value, sorted within
                   files, so an equality probe prunes to one bucket
                   directory and min/max-skips within it
  index_lookup  -> pruned scan of the index bucket -> semi-join the
                   recovered rowkeys back to the base table

Scale math: a 100 TB base table with a 0.1% selective predicate
costs a 100 TB scan without the index; with it, the probe reads one
index bucket (~index_size / n_buckets) plus the matching base rows.
The index is eventually-consistent with the base (rebuilt per batch
or maintained by the same MERGE that mutates the base — merge.py);
HBase's own index tables carry the identical caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def index_build(
    df: DataFrame, index_dir: str, indexed_col: str, key_col: str, n_buckets: int = 16
) -> None:
    """Write the (value, rowkey) index table, partitioned by value
    bucket. One shuffle of two narrow columns — never the full rows."""
    (
        df.select(indexed_col, key_col)
        .withColumn("bucket", F.crc32(F.col(indexed_col).cast("string")) % n_buckets)
        .repartition("bucket")
        .sortWithinPartitions(indexed_col)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(index_dir)
    )


def index_lookup(
    spark: SparkSession,
    base: DataFrame,
    index_dir: str,
    indexed_col: str,
    key_col: str,
    value,
    n_buckets: int = 16,
) -> DataFrame:
    """Equality probe via the index: bucket-pruned index scan ->
    broadcast semi-join of the recovered keys onto the base table."""
    from pyspark.errors import AnalysisException

    try:
        idx = spark.read.parquet(index_dir)
    except AnalysisException:
        # an empty base table writes a partitioned dir with no data
        # files (only _SUCCESS) — schema inference fails; the correct
        # answer is simply the empty result
        return base.limit(0)
    bucket = F.crc32(F.lit(str(value))) % n_buckets
    keys = (
        idx.filter((F.col("bucket") == bucket) & (F.col(indexed_col) == value))
        .select(key_col)
        .distinct()
    )
    return base.join(keys, key_col, "left_semi")


def index_incremental_update(
    spark: SparkSession,
    index_dir: str,
    base_before: DataFrame,
    delta: DataFrame,
    indexed_col: str,
    key_col: str,
    n_buckets: int = 16,
) -> dict:
    """Maintain the index through an upsert WITHOUT rebuilding it:
    rewrite only the value-buckets actually touched by the delta —
    the buckets of the updated keys' OLD values (their stale entries
    must disappear) plus the buckets of the NEW values (their
    entries must appear). Everything else is untouched on disk,
    exactly the file-level COW economics of txlog MERGE applied to
    the index table: a 1-row delta against a 100 TB index rewrites
    ~2 bucket directories, not the index.

    Mechanics: dynamic partition overwrite (per-bucket dirs) with
    the replacement content = (current touched-bucket entries minus
    updated keys) ∪ (delta entries). Returns
    {buckets_total, buckets_rewritten} so callers — and tests — see
    the write amplification."""
    bucket_of = lambda c: F.crc32(c.cast("string")) % n_buckets  # noqa: E731
    keys = delta.select(key_col).distinct()
    old_entries = base_before.join(keys, key_col, "left_semi").select(
        indexed_col, key_col
    )
    new_entries = delta.select(indexed_col, key_col)
    touched = sorted(
        r["bucket"]
        for r in old_entries.select(bucket_of(F.col(indexed_col)).alias("bucket"))
        .unionAll(new_entries.select(bucket_of(F.col(indexed_col)).alias("bucket")))
        .distinct()
        .collect()
    )  # bucket-id list: metadata-scale driver round-trip
    idx = spark.read.parquet(index_dir)
    # Materialize survivors BEFORE the overwrite below: the write
    # targets index_dir while this frame lazily reads from it, and
    # relying on dynamic partitionOverwriteMode staging its output
    # before the swap is an implementation detail, not a contract
    # (ADVICE r04). localCheckpoint pins the survivor rows to
    # executor storage so the read plan never touches the directory
    # mid-overwrite. Survivor volume is bounded by the touched
    # buckets (~2 per delta key), not the index size.
    survivors = idx.filter(F.col("bucket").isin(touched)).join(
        keys, key_col, "left_anti"
    ).localCheckpoint(eager=True)
    additions = new_entries.withColumn(
        "bucket", bucket_of(F.col(indexed_col))
    ).select(*survivors.columns)
    (
        survivors.unionByName(additions)
        .repartition("bucket")
        .sortWithinPartitions(indexed_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(index_dir)
    )
    return {
        "buckets_total": n_buckets,
        "buckets_rewritten": len(touched),
        "buckets": touched,
    }
