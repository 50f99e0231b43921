"""§2.4 Joins.

HBase has no server-side join; its support tooling does client-side /
MR joins (SURVEY.md §2.4). Here every join is declared as a DataFrame
equi- or theta-join and Catalyst+AQE choose the physical strategy:
broadcast-hash for dim tables, sort-merge for fact-fact, with AQE
runtime demotion and skew splitting.

Scale notes:
  * `join_broadcast` pins the hint explicitly; all other equi-joins
    leave the choice to AQE (right at 100 TB, where runtime sizes
    beat static estimates).
  * Theta joins (`join_range_theta`, `join_interval_overlap`) keep
    one side broadcast-small or carry an equality key so the plan is
    never a fact×fact nested loop.
  * `join_multiway_star` is the flagship: dims broadcast, the two
    fact tables sort-merge on their natural key, aggregation is
    partial+final (map-side combine) — the shape that survives 1000
    executors.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..io import load_table, scratch_root
from ..num import money_sum
from ..registry import register


@register(
    "join_inner_equi",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS order_cnt,
           SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_inner_equi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("order_cnt"),
            money_sum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left(spark, sf_dir):
    """Left enrichment join — customers keep a row even with zero
    orders (COUNT of the null key = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "join_right",
    oracle="""
    SELECT n.n_name, COUNT(s.s_suppkey) AS supp_cnt
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_right(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("supp_cnt"))
    )


@register(
    "join_full",
    oracle="""
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           COALESCE(a.click_cnt, 0) AS click_cnt,
           COALESCE(b.purchase_cnt, 0) AS purchase_cnt
    FROM (SELECT user_id, COUNT(*) AS click_cnt FROM events
          WHERE event_type = 'click' GROUP BY user_id) a
    FULL JOIN (SELECT user_id, COUNT(*) AS purchase_cnt FROM events
          WHERE event_type = 'purchase' GROUP BY user_id) b
      ON a.user_id = b.user_id
    """,
)
def join_full(spark, sf_dir):
    """Full outer join; unmatched sides stabilized with COALESCE so
    the hashed values are engine-independent."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("click_cnt"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("purchase_cnt"))
    )
    j = clicks.alias("a").join(
        purchases.alias("b"), F.col("a.user_id") == F.col("b.user_id"), "full"
    )
    return j.select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        F.coalesce(F.col("click_cnt"), F.lit(0)).alias("click_cnt"),
        F.coalesce(F.col("purchase_cnt"), F.lit(0)).alias("purchase_cnt"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark, sf_dir):
    """Existence probe ≈ batched multi-Get: left-semi never duplicates
    the probe side and only ships the join key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_anti(spark, sf_dir):
    """Missing-key detection (VerifyReplication's only-in-A set):
    customers with no high-value order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast",
    oracle="""
    SELECT p.p_brand,
           COUNT(*) AS line_cnt,
           SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
                    AS BIGINT)) / 100.0 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'PROMO'
    GROUP BY p.p_brand
    """,
)
def join_broadcast(spark, sf_dir):
    """Small dim × huge fact — the classic HBase-dim pattern. The
    explicit broadcast hint guarantees a map-side hash join: zero
    shuffle of the fact table. PRECONDITION (this §2 row demonstrates
    the broadcast VERB, so the hint is the point): the dim, after
    pushdown filters, must fit the broadcast budget — for SF-scale
    dims use join_inner_equi and let AQE pick the strategy (r10
    broadcast-hint audit)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)  # bcast: verb
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("line_cnt"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_range_theta",
    oracle="""
    SELECT b.band, COUNT(*) AS event_cnt, ROUND(SUM(e.value), 2) AS total_value
    FROM events e
    JOIN (VALUES (CAST(0.0 AS DOUBLE),   CAST(50.0 AS DOUBLE),  'low'),
                 (CAST(50.0 AS DOUBLE),  CAST(150.0 AS DOUBLE), 'mid'),
                 (CAST(150.0 AS DOUBLE), CAST(300.0 AS DOUBLE), 'high'),
                 (CAST(300.0 AS DOUBLE), CAST(1000.0 AS DOUBLE),'extreme')) b(lo, hi, band)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def join_range_theta(spark, sf_dir):
    """Band (theta) join: fact × tiny broadcast range table →
    BroadcastNestedLoopJoin, which is the *correct* physical plan when
    one side is 4 rows — the fact side is never shuffled."""
    ev = load_table(spark, sf_dir, "events")
    bands_schema = StructType(
        [
            StructField("lo", DoubleType()),
            StructField("hi", DoubleType()),
            StructField("band", StringType()),
        ]
    )
    bands = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 300.0, "high"), (300.0, 1000.0, "extreme")],
        bands_schema,
    )
    return (
        ev.join(F.broadcast(bands), (ev.value >= bands.lo) & (ev.value < bands.hi))  # bcast: lexicon
        .groupBy("band")
        .agg(
            F.count("*").alias("event_cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "join_interval_overlap",
    oracle="""
    SELECT o.o_orderstatus, COUNT(*) AS overlap_cnt
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND o.o_orderdate <= l.l_shipdate + INTERVAL 30 DAY
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderstatus
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval-overlap join ([date, date+30d] windows). Carries the
    equi-key so the plan stays a hash/sort-merge join with the band
    conditions as post-join filters — never a cross product."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (o.o_orderdate <= li.l_shipdate + F.expr("INTERVAL 30 DAYS"))
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return o.join(li, cond).groupBy("o_orderstatus").agg(F.count("*").alias("overlap_cnt"))


@register(
    "join_shipping_priority_topk",
    oracle="""
    SELECT l.l_orderkey,
           SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
                    AS BIGINT)) / 100.0 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def join_shipping_priority_topk(spark, sf_dir):
    """TPC-H Q3 shape (bench headline q3): selective dim filter →
    two fact joins → agg → global top-10 (TakeOrdered, no full
    sort). Customer is broadcast after its segment filter."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    # customer is SF-scale even after the segment filter — no FORCE
    # hint (r10 broadcast-hint audit): AQE broadcasts it at every
    # test SF (executed plan unchanged), shuffle-joins past the
    # threshold instead of OOMing the driver.
    return (
        c
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "join_multiway_star",
    oracle="""
    SELECT n.n_name,
           SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
                    AS BIGINT)) / 100.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def join_multiway_star(spark, sf_dir):
    """Flagship 6-table star join (TPC-H Q5 shape; SURVEY.md §6/§7).

    region/nation/supplier/customer broadcast; orders⋈lineitem is the
    one genuine shuffle (sort-merge on orderkey); the date filter is
    pushed to the orders scan and dynamic partition pruning would cut
    the fact scan on a date-partitioned 100-TB layout.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)  # bcast: dim
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)  # bcast: dim
        .groupBy("n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS order_cnt,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_skew_salted(spark, sf_dir):
    """Skew-mitigated equi-join: the fact side gets a deterministic
    salt (md5-h60 of its row id, mod 8) and the dim side is exploded
    into all 8 salt replicas, so a hot customer key's rows spread
    over 8 reducers instead of one. Result is provably identical to
    the plain join (the oracle IS the plain join); only the physical
    row distribution changes. At 100 TB this is the manual fallback
    when AQE's skew-join split can't help — e.g. a skewed
    *aggregation* downstream of the join, or a build side too big to
    split. The salt count trades skew headroom against dim
    replication (8x here — still broadcast-size for a dim)."""
    from ..hashutil import h60

    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.expr(f"{h60('cast(o_orderkey AS string)')} % 8")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(7))))
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("order_cnt"),
            money_sum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "join_er_numeric_banding",
    oracle="""
    WITH banded AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(FLOOR(c_acctbal / 50.0) AS BIGINT) AS band
      FROM customer
    ),
    expanded AS (
      SELECT *, band AS probe_band FROM banded
      UNION ALL
      SELECT c_custkey, c_mktsegment, c_acctbal, band, band + 1 AS probe_band
      FROM banded
      UNION ALL
      SELECT c_custkey, c_mktsegment, c_acctbal, band, band - 1 AS probe_band
      FROM banded
    )
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           a.c_mktsegment AS segment,
           ROUND(ABS(a.c_acctbal - b.c_acctbal), 2) AS balance_gap
    FROM expanded a JOIN banded b
      ON a.c_mktsegment = b.c_mktsegment AND a.probe_band = b.band
         AND a.c_custkey < b.c_custkey
    WHERE ABS(a.c_acctbal - b.c_acctbal) <= 25.0
    """,
)
def join_er_numeric_banding(spark, sf_dir):
    """Entity-resolution banding for NUMERIC attributes — the
    record-linkage counterpart of LSH: candidates for 'same entity,
    slightly different balance' must agree on the blocking key
    (segment) and sit within a tolerance (25.0) of each other. A
    naive |x_a - x_b| <= eps predicate is a theta join (quadratic);
    banding by floor(x / 2*eps) and probing each row's own band plus
    both neighbors turns it into an EQUI-join that covers every
    qualifying pair: two values within eps land in the same or
    adjacent bands, and because the pair filter (custkey_a <
    custkey_b) is key-based — not band-based — the qualifying
    neighbor may sit in either the band above OR below, so both
    must be probed (probing only band+1 silently drops pairs whose
    smaller key holds the larger value; ADVICE r02). Each pair still
    matches exactly once — the unexpanded side's band is a single
    value and the probe values are distinct. One side expands 3x —
    the standard band-join rewrite, and the same shape matches
    timestamps, coordinates, or any metric attribute at 100 TB
    without a cross product."""
    c = load_table(spark, sf_dir, "customer")
    banded = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.floor(F.col("c_acctbal") / 50.0).alias("band"),
    )
    expanded = (
        banded.withColumn("probe_band", F.col("band"))
        .unionByName(banded.withColumn("probe_band", F.col("band") + 1))
        .unionByName(banded.withColumn("probe_band", F.col("band") - 1))
    )
    a = expanded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.probe_band") == F.col("b.band"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 25.0)
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            F.col("a.c_mktsegment").alias("segment"),
            F.round(F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")), 2).alias(
                "balance_gap"
            ),
        )
    )


@register(
    "join_er_fuzzy_string",
    oracle="""
    WITH keys AS (
      SELECT c_custkey, c_name, LENGTH(c_name) AS ln
      FROM customer
    )
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           a.c_name AS name_a, b.c_name AS name_b,
           levenshtein(a.c_name, b.c_name) AS edit_distance
    FROM keys a JOIN keys b
      ON a.ln = b.ln AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) = 1
    """,
)
def join_er_fuzzy_string(spark, sf_dir):
    """String entity resolution: candidate 'same entity, typo'd key'
    pairs at edit distance exactly 1 (equal length ⇒ exactly one
    substitution), via DELETION NEIGHBORHOODS (FastSS, Bocek et al.
    2007): two equal-length strings differ at exactly one position p
    iff deleting p from both yields equal residues (and the strings
    differ) — so explode each name into its L single-deletion
    variants and equi-join on (position, residue). Each qualifying
    pair collides at exactly ONE position, so candidates need no
    dedup, and non-pairs never collide: candidate generation is
    exact and LINEAR (L·N index rows, one hash shuffle on the
    residue key).

    Why not length blocking: every fixture name is 'Customer#nnnnnn'
    — same length, so a length block degenerates to one bucket and
    N²/2 Levenshteins (measured 722 s at sf0.1; this form runs in
    ~2 s and is result-identical — the oracle keeps the naive
    blocked-join statement of the semantics). The same degeneracy
    hits ANY blocked scheme on low-entropy keys at 100 TB; deletion
    neighborhoods are the standard ER answer for small edit radii.
    Both engines ship identical Levenshtein semantics (pinned by the
    hypothesis property suite)."""
    c = load_table(spark, sf_dir, "customer")
    keys = c.select("c_custkey", "c_name")
    variants = keys.select(
        "c_custkey",
        "c_name",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(c_name)),"
                " i -> concat(substring(c_name, 1, i - 1),"
                " substring(c_name, i + 1, length(c_name))))"
            )
        ).alias("pos", "residue"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    return (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.residue") == F.col("b.residue"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey"))
            & (F.col("a.c_name") != F.col("b.c_name")),
        )
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("edit_distance"),
        )
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS order_cnt,
           CAST(SUM(li.line_cnt) AS BIGINT) AS total_lines,
           ROUND(SUM(li.revenue_cents) / 100.0, 2) AS total_revenue
    FROM orders o
    JOIN (SELECT l_orderkey,
                 COUNT(*) AS line_cnt,
                 SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                          AS BIGINT)) AS revenue_cents
          FROM lineitem GROUP BY l_orderkey) li
      ON o.o_orderkey = li.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Shuffle-free fact-to-fact join via bucketed layout — the
    100-TB co-location story as a GRADED query, not just a test.
    Both sides (orders, and a per-order lineitem rollup) are written
    as 8-bucket tables hash-bucketed on the order key
    (sources/layout.py's writer pattern, external-path tables under
    .scratch); the join then reads co-located buckets and compiles
    to a SortMergeJoin with NO Exchange on either side — the only
    shuffle left in the plan is the final 3-key status aggregate
    (asserted in tests/test_plans.py). The oracle joins the raw
    fixtures, proving bucketing is a pure physical-layout change.
    At 100 TB this is the difference between re-shuffling two fact
    tables on every join and paying the shuffle once at ingest;
    revenue rides the cents contract end-to-end (num.py)."""
    import os

    scratch = scratch_root()
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("line_cnt"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
                )
            ).alias("revenue_cents"),
        )
    )
    for df, name, key in (
        (o, "bkt_orders_colocated", "o_orderkey"),
        (li, "bkt_lineagg_colocated", "l_orderkey"),
    ):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(scratch, name))
            .format("parquet")
            .saveAsTable(name)
        )
    lt = spark.table("bkt_orders_colocated").hint("merge")
    rt = spark.table("bkt_lineagg_colocated")
    return (
        lt.join(rt, lt.o_orderkey == rt.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("order_cnt"),
            F.sum("line_cnt").cast("bigint").alias("total_lines"),
            F.round(F.sum("revenue_cents") / 100.0, 2).alias("total_revenue"),
        )
    )


@register(
    "join_dim_scd2",
    oracle="""
    WITH dim AS (
      SELECT user_id,
             CAST(JSON_EXTRACT(props, '$.k') AS INT) AS segment,
             epoch_us(ts) AS vf,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS vt
      FROM events WHERE event_type = 'signup'),
    fact AS (
      SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, d.segment
    FROM fact f
    LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.us >= d.vf
     AND (d.vt IS NULL OR f.us < d.vt)
    """,
)
def join_dim_scd2(spark, sf_dir):
    """Slowly-changing-dimension (type 2) point-in-time join — the
    warehouse staple the as-of family approximates: a dimension
    change-log (each user's 'signup' events; props.k is the changing
    segment attribute) is first built into non-overlapping validity
    intervals [valid_from, valid_to) via lead() over the per-key
    change sequence, then every fact row (purchases) joins to the
    ONE dimension version valid at its own timestamp. LEFT join
    keeps facts that predate the first dimension version (segment
    NULL) — the classic early-fact edge. Time is exact integer
    microseconds, ties broken by event_id, so interval bounds are
    engine-deterministic; same-instant changes produce an empty
    interval that can never match, not a double match. Scale shape:
    interval build is one windowed pass over the (small) change log;
    the join keeps user_id as a hash/merge EQUALITY key with the
    interval bounds as post-join filters — a SortMergeJoin at any
    scale, never a nested loop; per-key match work is bounded by
    that key's version count.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    wd = Window.partitionBy("user_id").orderBy("vf", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("segment"),
            us.alias("vf"),
        )
        .select("user_id", "segment", "vf", F.lead("vf").over(wd).alias("vt"))
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("us")
    )
    cond = (
        (fact["user_id"] == dim["user_id"])
        & (fact["us"] >= dim["vf"])
        & (dim["vt"].isNull() | (fact["us"] < dim["vt"]))
    )
    return fact.join(dim, cond, "left").select(
        fact["event_id"], fact["user_id"], dim["segment"]
    )


@register(
    "join_null_key_bypass",
    oracle="""
    WITH f AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_custkey END
               AS cust_fk,
             o_totalprice
      FROM orders
    )
    SELECT f.o_orderkey, f.cust_fk, c.c_mktsegment,
           CAST(FLOOR(f.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
    FROM f LEFT JOIN customer c ON c.c_custkey = f.cust_fk
    """,
)
def join_null_key_bypass(spark, sf_dir):
    """Null-skewed outer join with the null-key bypass — THE classic
    shuffle-skew fix nobody's optimizer applies for you: when a large
    share of fact rows carry a NULL foreign key (here ~8%,
    deterministically nulled), a plain left join shuffles every one
    of them into the single NULL hash partition where they match
    nothing. The rewrite splits the fact: non-null rows take the
    real join; null rows UNION back with the dim columns pre-filled
    NULL, touching no shuffle at all. Result-identical to the naive
    join (SQL NULL keys never match) — the oracle IS the naive form.

    At 100 TB the difference is one straggler task holding 8% of the
    table vs none; the same pattern generalizes to any sentinel key
    ('', 0, 'UNKNOWN') by mapping it to NULL first. AQE's skew-join
    splitting mitigates but still shuffles the dead rows — the
    bypass deletes the work instead."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    f = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("price_cents"),
    )
    matched = (
        f.filter(F.col("cust_fk").isNotNull())
        .join(c, f["cust_fk"] == c["c_custkey"], "left")
        .select("o_orderkey", "cust_fk", "c_mktsegment", "price_cents")
    )
    bypassed = f.filter(F.col("cust_fk").isNull()).select(
        "o_orderkey",
        "cust_fk",
        F.lit(None).cast("string").alias("c_mktsegment"),
        "price_cents",
    )
    return matched.unionByName(bypassed)
