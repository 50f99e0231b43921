"""§2.7 Sort / limit / top-k / set operations / table diff.

The ops-tooling surface: sorted scans, heaviest-keys reports, snapshot
merges, and replica comparison (HashTable/SyncTable,
VerifyReplication — public HBase tool semantics; SURVEY.md §2.7).

Scale notes: global top-k compiles to TakeOrderedAndProject
(per-partition heaps + driver merge of k rows — never a full sort);
`table_diff_hash` compares replicas by bucket digests first so only
mismatched buckets would be drilled into at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..hashutil import d_h60, h60
from ..io import load_table
from ..registry import register


@register(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey
    LIMIT 500
    """,
)
def sort_multi_key(spark, sf_dir):
    """Rowkey-order emulation (HBase scans are always key-sorted):
    multi-key sort, range-partitioned; limit keeps grading
    deterministic via the unique tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.col("o_orderstatus").asc(), F.col("o_totalprice").desc(), "o_orderkey")
        .limit(500)
    )


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_global(spark, sf_dir):
    """Heaviest keys report — global top-10 by value."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT n_name, s_suppkey, s_acctbal
    FROM (
      SELECT n.n_name, s.s_suppkey, s.s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    ) WHERE rn <= 2
    """,
)
def topk_per_group(spark, sf_dir):
    """Top-2 suppliers per nation by account balance.

    Scale shape (restructured in the r7 funnel sweep): the direct
    ``PARTITION BY n_name`` window sorts all suppliers inside 25
    tasks regardless of cluster size. Two-phase partial top-k
    instead: a local top-2 per (nation, input partition) window —
    parallel and heap-bounded, each scan partition surrenders at
    most 2 rows per nation — then the exact window over the ≤ 2·P
    survivors per nation, metadata-scale. Local winners are a
    superset of the global top-2 under any layout, so the result is
    layout-invariant (asserted by the invariance sweep)."""
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cand = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)  # bcast: dim
        .select("n_name", "s_suppkey", "s_acctbal")
        .withColumn("_pid", F.spark_partition_id())
    )
    w_loc = Window.partitionBy("n_name", "_pid").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    )
    local = cand.withColumn("_lrn", F.row_number().over(w_loc)).filter(
        F.col("_lrn") <= 2
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    )
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("n_name", "s_suppkey", "s_acctbal")
    )


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_all(spark, sf_dir):
    """Merging incremental snapshots — bag union, no dedup shuffle."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_name")
    return a.unionByName(b)


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_distinct(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_name")
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark, sf_dir):
    """Keys present in both replicas/snapshots (SyncTable overlap)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except(spark, sf_dir):
    """Replica divergence — keys only in A (VerifyReplication
    BADROWS)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.subtract(b)


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark, sf_dir):
    """Bag difference — multiplicity-aware divergence count."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@register(
    "set_symmetric_diff",
    oracle="""
    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
     EXCEPT
     SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    UNION
    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
     EXCEPT
     SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def set_symmetric_diff(spark, sf_dir):
    """Symmetric difference — keys in exactly one replica (the full
    two-sided VerifyReplication report)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.subtract(b).union(b.subtract(a)).distinct()


_ROW_STR_S = (
    "concat_ws('|', cast(o_orderkey AS string), cast(o_custkey AS string),"
    " o_orderstatus, cast(cast(round(o_totalprice * 100) AS bigint) AS string))"
)
_ROW_STR_D = (
    "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),"
    " o_orderstatus, CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR))"
)


@register(
    "table_bucket_digest",
    oracle=f"""
    SELECT o_orderkey % 256 AS bucket,
           bit_xor({d_h60(_ROW_STR_D)}) AS digest,
           COUNT(*) AS bucket_rows
    FROM orders GROUP BY o_orderkey % 256
    """,
)
def table_bucket_digest(spark, sf_dir):
    """HashTable step of HashTable/SyncTable: per-bucket order-
    independent digests of the row content. At 100 TB both replicas
    compute this cheaply (one pass, 256 rows out) and only buckets
    whose digests differ get the row-level drill-in
    (`table_diff_hash`, prefilter in tools/table_diff.py). bit_xor
    makes the fold commutative, so no per-bucket sort is needed.

    The row digest is the engine-portable md5-prefix hash over a
    canonical string (doubles rendered as exact integer cents — never
    float-to-string, which the engines format differently), so the
    DuckDB oracle reproduces the digests bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.pmod(F.col("o_orderkey"), F.lit(256)).alias("bucket")
    ).agg(
        F.expr(f"bit_xor({h60(_ROW_STR_S)})").alias("digest"),
        F.count("*").alias("bucket_rows"),
    )


@register(
    "table_diff_hash",
    oracle="""
    WITH replica_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
    )
    SELECT a.o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'missing_in_b'
                ELSE 'value_mismatch' END AS diff_type
    FROM orders a
    LEFT JOIN replica_b b ON a.o_orderkey = b.o_orderkey
    WHERE b.o_orderkey IS NULL
       OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
    """,
)
def table_diff_hash(spark, sf_dir):
    """HashTable/SyncTable — replica comparison.

    Replica B is simulated deterministically (drop every 97th key,
    perturb every 89th value). The graded output is the row-level
    drill-in (full-outer row diff, engine-portable); the bucket-digest
    prefilter that makes this cheap at 100 TB is implemented in
    tools/table_diff.py (`sync_table_diff`): per-bucket bit_xor of the
    portable md5-prefix row hash on both replicas, then the row join
    runs only inside mismatched buckets (tests/test_units.py pins the
    prefiltered diff equal to this full diff).
    """
    orders = load_table(spark, sf_dir, "orders")
    replica_b = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    a = orders.select("o_orderkey", "o_totalprice").alias("a")
    b = replica_b.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "left")
    return j.filter(
        F.col("b.o_orderkey").isNull()
        | ~F.col("a.o_totalprice").eqNullSafe(F.col("b.o_totalprice"))
    ).select(
        F.col("a.o_orderkey").alias("o_orderkey"),
        F.when(F.col("b.o_orderkey").isNull(), "missing_in_b")
        .otherwise("value_mismatch")
        .alias("diff_type"),
    )
