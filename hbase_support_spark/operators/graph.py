"""Iterative graph analytics over relational edges.

The part↔supplier bipartite graph falls out of the fact table (who
supplies what); entity-importance over it is the classic PageRank
shape. Spark's story for iterative graph algorithms at 100 TB is a
DataFrame join-agg per superstep (edges shuffled on src, then on
dst) — GraphX/GraphFrames compile to exactly this — so the operator
is stated directly in those terms, with a FIXED iteration count so it
is a deterministic, SQL-oracle-checkable query (the same decision
dedup_cluster_keep_min makes for label propagation; unbounded
convergence loops belong to jobs, not graded queries).

Determinism contract: ranks are integer units at 1e12 scale. Each
superstep's neighbor sum is a BIGINT sum of floored per-edge
contributions — exact and order-independent — and the only float ops
(damping multiply, 1/outdeg and 1/n divisions) are per-row IEEE
doubles computed identically in both engines, immediately floored
back to integer units. No accumulation-order-dependent float sum
anywhere (num.py's cents discipline applied to graph state).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table, pin as _pin
from ..registry import register

_SCALE = 1_000_000_000_000  # integer rank units: 1.0 == 1e12
_D = 0.85  # damping


def _pagerank_oracle(iters: int) -> str:
    parts = [
        """
    WITH pairs AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    edges AS (
      SELECT p * 2 AS src, s * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT s * 2 + 1 AS src, p * 2 AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (
      SELECT id, CAST(FLOOR(1000000000000.0 / nn.n) AS BIGINT) AS r
      FROM nodes CROSS JOIN nn
    )"""
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(
            f""",
    agg{i} AS (
      SELECT e.dst AS id,
             CAST(SUM(CAST(FLOOR({prev}.r / deg.outdeg) AS BIGINT)) AS BIGINT)
               AS contrib
      FROM edges e
      JOIN {prev} ON {prev}.id = e.src
      JOIN deg ON deg.id = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT a.id,
             CAST(FLOOR(0.15 * 1000000000000.0 / nn.n) AS BIGINT)
             + CAST(FLOOR(0.85 * a.contrib) AS BIGINT) AS r
      FROM agg{i} a CROSS JOIN nn
    )"""
        )
        prev = f"r{i}"
    parts.append(
        f"""
    SELECT CASE WHEN id % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_kind,
           CAST(FLOOR(id / 2) AS BIGINT) AS node_key,
           r AS rank_units,
           ROUND(r / 1000000000000.0, 9) AS pagerank
    FROM {prev}
    ORDER BY r DESC, id
    LIMIT 20"""
    )
    return "".join(parts)


@register("graph_pagerank_bipartite", oracle=_pagerank_oracle(3))
def graph_pagerank_bipartite(spark, sf_dir):
    """Top-20 PageRank over the part↔supplier bipartite graph
    (damping 0.85, 3 supersteps, integer-unit ranks — see module
    docstring for the determinism contract). Physical shape per
    superstep: edges join ranks on src (hash join on the edge key —
    the same partitioning every superstep, so at scale you bucket
    the edge table once on src and the per-step shuffle disappears),
    then one hash agg on dst; the node count and degree tables are
    metadata-scale and broadcast. TakeOrdered for the final top-20 —
    no global sort of the rank vector."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    edges = pairs.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).unionByName(
        pairs.select(
            (F.col("l_suppkey") * 2 + 1).alias("src"),
            (F.col("l_partkey") * 2).alias("dst"),
        )
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    nn = nodes.agg(F.count("*").alias("n"))
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("outdeg")
    )
    ranks = nodes.crossJoin(F.broadcast(nn)).select(  # bcast: scalar
        "id", F.floor(float(_SCALE) / F.col("n")).cast("bigint").alias("r")
    )
    for _ in range(3):
        contrib = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum(F.floor(F.col("r") / F.col("outdeg")).cast("bigint"))
                .cast("bigint")
                .alias("contrib")
            )
        )
        ranks = contrib.crossJoin(F.broadcast(nn)).select(  # bcast: scalar
            "id",
            (
                F.floor(0.15 * float(_SCALE) / F.col("n")).cast("bigint")
                + F.floor(0.85 * F.col("contrib")).cast("bigint")
            ).alias("r"),
        )
    return (
        ranks.select(
            F.when(F.col("id") % 2 == 0, "part").otherwise("supplier").alias(
                "node_kind"
            ),
            F.floor(F.col("id") / 2).cast("bigint").alias("node_key"),
            F.col("r").alias("rank_units"),
            F.round(F.col("r") / float(_SCALE), 9).alias("pagerank"),
        )
        .orderBy(F.col("rank_units").desc(), F.col("node_key"), "node_kind")
        .limit(20)
    )


@register(
    "basket_copurchase_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT ok) AS n FROM items),
    item_cnt AS (SELECT part, COUNT(*) AS cnt FROM items GROUP BY part),
    pair_cnt AS (
      SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS support
      FROM items a JOIN items b
        ON a.ok = b.ok AND a.part < b.part
      GROUP BY a.part, b.part
    )
    SELECT p.part_a, p.part_b, p.support,
           ROUND(p.support / CAST(ca.cnt AS DOUBLE), 6) AS confidence_ab,
           ROUND(p.support * CAST(n.n AS DOUBLE) / (ca.cnt * cb.cnt), 6)
             AS lift
    FROM pair_cnt p
    JOIN item_cnt ca ON ca.part = p.part_a
    JOIN item_cnt cb ON cb.part = p.part_b
    CROSS JOIN n_orders n
    ORDER BY p.support DESC, p.part_a, p.part_b
    LIMIT 20
    """,
)
def basket_copurchase_lift(spark, sf_dir):
    """Market-basket co-purchase mining: the top-20 part pairs by
    basket support, with confidence(a→b) and lift — the association-
    rule core behind 'frequently bought together'. The pair
    expansion is a self-equi-join on the ORDER key, so the blowup is
    per-basket (|basket| choose 2 with baskets ~7 lines in this
    schema), LINEAR in orders — never an item-item cross product;
    per-item counts attach by unhinted join (part-scale — AQE
    broadcasts while small; r10 broadcast-hint audit), the 1-row
    order total by broadcast.
    Everything derives from integer counts, so the confidence/lift
    doubles are single deterministic divisions. At 100 TB a hot
    basket (one order with thousands of items) is the skew hazard —
    cap basket size at ingest or let AQE skew-split the order-key
    shuffle (tests/test_aqe.py demonstrates the mechanism)."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part")
    ).distinct()
    n_orders = items.agg(F.count_distinct("ok").alias("n"))
    item_cnt = items.groupBy("part").agg(F.count("*").alias("cnt"))
    a, b = items.alias("a"), items.alias("b")
    pair_cnt = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.part") < F.col("b.part")),
        )
        .groupBy(
            F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b")
        )
        .agg(F.count("*").alias("support"))
    )
    ca = item_cnt.select(F.col("part").alias("part_a"), F.col("cnt").alias("cnt_a"))
    cb = item_cnt.select(F.col("part").alias("part_b"), F.col("cnt").alias("cnt_b"))
    # ca/cb are PART-scale (grow with SF): no broadcast hint, same
    # rationale as graph_degree_assortativity above; the 1-row
    # n_orders stays hinted.
    return (
        pair_cnt.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders))  # bcast: scalar
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(F.col("support") / F.col("cnt_a").cast("double"), 6).alias(
                "confidence_ab"
            ),
            F.round(
                F.col("support")
                * F.col("n").cast("double")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "graph_triangle_count",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem
    ),
    und AS (
      SELECT a.part AS u, b.part AS v
      FROM items a JOIN items b ON a.ok = b.ok AND a.part < b.part
      GROUP BY a.part, b.part
      HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT id, COUNT(*) AS d FROM (
        SELECT u AS id FROM und UNION ALL SELECT v FROM und
      ) GROUP BY id
    ),
    oriented AS (
      SELECT CASE WHEN (du.d, u) < (dv.d, v) THEN u ELSE v END AS src,
             CASE WHEN (du.d, u) < (dv.d, v) THEN v ELSE u END AS dst
      FROM und JOIN deg du ON du.id = u JOIN deg dv ON dv.id = v
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM oriented e1
      JOIN oriented e2 ON e1.dst = e2.src
      WHERE EXISTS (SELECT 1 FROM oriented e3
                    WHERE e3.src = e1.src AND e3.dst = e2.dst)
    ),
    stats AS (
      SELECT COUNT(*) AS n_vertices,
             CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
      FROM deg
    ),
    ecnt AS (SELECT COUNT(*) AS n_edges FROM und)
    SELECT stats.n_vertices, ecnt.n_edges, tri.n_triangles,
           ROUND(3.0 * tri.n_triangles / NULLIF(stats.n_wedges, 0), 6)
             AS clustering_coeff
    FROM stats, ecnt, tri
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Exact triangle counting over the co-purchase graph (part pairs
    sharing >= 2 orders) with the degree-orientation kernel — the
    standard distributed-triangle algorithm: orient every undirected
    edge from its lower-(degree, id) endpoint to the higher one, join
    oriented edges head-to-tail into wedges, and close each wedge
    with a semi-join back onto the oriented edge set. Orientation is
    the scale trick: out-degree is bounded by O(sqrt(m)), so the
    wedge join never explodes on a hub vertex the way a naive
    neighbor self-join does — the difference between feasible and
    quadratic at a 100 TB edge list. Also emits the exact wedge
    count (sum of d-choose-2 — integer) and the global clustering
    coefficient (one deterministic division). Every count is a
    BIGINT; the only float is the final coefficient. Shuffles: pair
    expansion on the order key (linear per basket), degree agg, two
    hash joins on vertex ids — all equality-keyed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    # The edge list feeds SIX consumers (degree, both orientation
    # sides, wedge tails/heads, closure, edge count); without
    # materialization Catalyst re-runs the basket pair-expansion per
    # consumer (measured: 54 shuffles / 128 aggs in the audit). The
    # DISK_ONLY pin (io.pin) materializes each derived frame once —
    # the ReuseExchange rationale of the ranking kernel, without
    # holding corpus-scale edges as deserialized rows on the heap.
    und = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.part") < F.col("b.part")))
        .groupBy(F.col("a.part").alias("u"), F.col("b.part").alias("v"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .transform(_pin)
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .transform(_pin)
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).select(
        F.col("e1.src").alias("x"), F.col("e2.dst").alias("z")
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("x"), F.col("dst").alias("z")),
        ["x", "z"],
        "left_semi",
    )
    tri = closed.agg(F.count("*").alias("n_triangles"))
    stats = deg.agg(
        F.count("*").alias("n_vertices"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges"),
    )
    ecnt = und.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(ecnt)
        .crossJoin(tri)
        .select(
            "n_vertices",
            "n_edges",
            "n_triangles",
            # NULLIF: a wedge-free graph (possible on a thin fixture)
            # must emit the oracle's NULL, not an ANSI div-zero crash
            F.round(
                3.0 * F.col("n_triangles") / F.nullif(F.col("n_wedges"), F.lit(0)), 6
            ).alias(
                "clustering_coeff"
            ),
        )
    )


@register(
    "graph_bfs_hops",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    edges AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
    d0 AS (SELECT MIN(l_partkey) AS id FROM lineitem),
    f1 AS (SELECT DISTINCT e.b AS id FROM edges e JOIN d0 ON e.a = d0.id),
    f2 AS (SELECT DISTINCT e.b AS id FROM edges e JOIN f1 ON e.a = f1.id),
    f3 AS (SELECT DISTINCT e.b AS id FROM edges e JOIN f2 ON e.a = f2.id),
    all_h AS (
      SELECT id, 0 AS h FROM d0
      UNION ALL SELECT id, 1 AS h FROM f1
      UNION ALL SELECT id, 2 AS h FROM f2
      UNION ALL SELECT id, 3 AS h FROM f3
    )
    SELECT id AS part, CAST(MIN(h) AS BIGINT) AS hops
    FROM all_h GROUP BY id
    """,
)
def graph_bfs_hops(spark, sf_dir):
    """Bounded BFS (3 supersteps) over the co-purchase graph from a
    deterministic source node — hop distances are the 'related
    products within N degrees' query, and the superstep-join shape
    IS Spark's iterative-graph execution model (GraphX compiles to
    exactly this frontier join + distinct per step; bounded depth
    keeps it a deterministic graded query, the pagerank decision).
    The edge list is built once and pinned (io.pin, DISK_ONLY) so three
    frontier joins don't re-derive it; each frontier is
    broadcast-joined while small and falls back to shuffle when it
    saturates — at 100 TB the frontier size, not the graph, drives
    each step's cost. min-hop union makes the result
    visit-order-independent."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
        .distinct()
    )
    edges = pairs.unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).transform(_pin)
    d0 = li.agg(F.min("l_partkey").alias("id"))
    f1 = (
        edges.join(F.broadcast(d0), edges.a == d0.id).select(F.col("b").alias("id")).distinct()  # bcast: scalar
    )
    f2 = edges.join(f1, edges.a == f1.id).select(F.col("b").alias("id")).distinct()
    f3 = edges.join(f2, edges.a == f2.id).select(F.col("b").alias("id")).distinct()
    all_h = (
        d0.select("id", F.lit(0).alias("h"))
        .unionAll(f1.select("id", F.lit(1).alias("h")))
        .unionAll(f2.select("id", F.lit(2).alias("h")))
        .unionAll(f3.select("id", F.lit(3).alias("h")))
    )
    return all_h.groupBy(F.col("id").alias("part")).agg(
        F.min("h").cast("bigint").alias("hops")
    )


@register(
    "graph_jaccard_nation_trade",
    oracle="""
    WITH np AS (
      SELECT DISTINCT s.s_nationkey AS nationkey, l.l_partkey AS partkey
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    sizes AS (
      SELECT nationkey, COUNT(*) AS n_parts FROM np GROUP BY nationkey
    ),
    inter AS (
      SELECT a.nationkey AS n1, b.nationkey AS n2, COUNT(*) AS n_common
      FROM np a JOIN np b
        ON a.partkey = b.partkey AND a.nationkey < b.nationkey
      GROUP BY a.nationkey, b.nationkey
    )
    SELECT i.n1, i.n2,
           CAST(sa.n_parts AS BIGINT) AS a_parts,
           CAST(sb.n_parts AS BIGINT) AS b_parts,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(i.n_common * 1000000
                // (sa.n_parts + sb.n_parts - i.n_common) AS BIGINT)
             AS jaccard_micro
    FROM inter i
    JOIN sizes sa ON sa.nationkey = i.n1
    JOIN sizes sb ON sb.nationkey = i.n2
    """,
)
def graph_jaccard_nation_trade(spark, sf_dir):
    """Common-neighbor Jaccard link prediction on the bipartite
    nation↔part trade graph — the similarity that powers 'entities
    like this one' recommendations: two nations are similar when the
    part sets their suppliers ship overlap, scored as an exact
    integer micro-Jaccard |A∩B|·1e6 div |A∪B|. Only pairs with a
    common part appear (zero-overlap pairs carry no signal and, at
    scale, must never be materialized).

    Scale shape: the classic sub-quadratic similarity-join plan —
    distinct (nation, part) edges, then a self-join keyed on the
    SHARED part (so candidate pairs are generated per part, never
    nation×nation), then a pair-keyed count. Nation fan-out per part
    is bounded by the 25-nation domain, so the per-key join blow-up
    is capped at C(25,2); the same plan with an unbounded left key
    would need the frequency-cap quarantine the dedup family uses.
    Size lookups broadcast (25 rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    np_ = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .select(F.col("s_nationkey").alias("nationkey"), F.col("l_partkey").alias("partkey"))
        .distinct()
    )
    sizes = np_.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n_parts"))
    a = np_.alias("a")
    b = np_.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.partkey") == F.col("b.partkey"))
            & (F.col("a.nationkey") < F.col("b.nationkey")),
        )
        .groupBy(
            F.col("a.nationkey").alias("n1"), F.col("b.nationkey").alias("n2")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = F.broadcast(sizes.withColumnRenamed("nationkey", "n1").withColumnRenamed("n_parts", "a_parts"))  # bcast: dim
    sb = F.broadcast(sizes.withColumnRenamed("nationkey", "n2").withColumnRenamed("n_parts", "b_parts"))  # bcast: dim
    return (
        inter.join(sa, "n1")
        .join(sb, "n2")
        .select(
            "n1",
            "n2",
            F.col("a_parts").cast("bigint").alias("a_parts"),
            F.col("b_parts").cast("bigint").alias("b_parts"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.expr("n_common * 1000000 div (a_parts + b_parts - n_common)")
            .cast("bigint")
            .alias("jaccard_micro"),
        )
    )


@register(
    "graph_connected_components",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey
       AND l1.l_partkey < l2.l_partkey
       AND l1.l_quantity = l2.l_quantity
    ),
    edges AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    adj AS (SELECT a AS id, b AS nbr FROM edges
            UNION ALL SELECT id, id AS nbr FROM verts),
    l0 AS (SELECT id, id AS lbl FROM verts),
    r1 AS (SELECT adj.id, MIN(l0.lbl) AS lbl
           FROM adj JOIN l0 ON adj.nbr = l0.id GROUP BY adj.id),
    r2 AS (SELECT adj.id, MIN(r1.lbl) AS lbl
           FROM adj JOIN r1 ON adj.nbr = r1.id GROUP BY adj.id),
    r3 AS (SELECT adj.id, MIN(r2.lbl) AS lbl
           FROM adj JOIN r2 ON adj.nbr = r2.id GROUP BY adj.id),
    r4 AS (SELECT adj.id, MIN(r3.lbl) AS lbl
           FROM adj JOIN r3 ON adj.nbr = r3.id GROUP BY adj.id)
    SELECT CAST(lbl AS BIGINT) AS component,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(id) AS BIGINT) AS min_member,
           CAST(MAX(id) AS BIGINT) AS max_member
    FROM r4 GROUP BY lbl
    """,
)
def graph_connected_components(spark, sf_dir):
    """Connected components by bounded min-label propagation — the
    canonical Pregel/GraphX algorithm expressed as 4 relational
    supersteps: every vertex starts labeled with its own id, each
    round takes the MIN label over itself and its neighbors
    (self-loop-augmented adjacency makes that one join + one MIN
    agg), and after k rounds labels are exact for every component of
    diameter <= k. The graph is the equal-quantity co-purchase graph
    (parts in one order with matching quantity — a sparse similarity
    graph, many small components), and the fixed round count keeps
    the query deterministic and fully SQL-oracle-checkable, the same
    bounded-superstep decision as graph_bfs_hops.

    Scale shape: the adjacency list is derived once and pinned
    (io.pin, DISK_ONLY) so 4 supersteps don't re-derive the self-join;
    each superstep is one shuffle-join on nbr + one map-side-
    combining MIN agg on id — exactly GraphX's aggregateMessages
    plan. Label state is one row per vertex; MIN makes every round
    order-independent, so the result is partitioning-invariant."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey"))
            & (F.col("a.l_quantity") == F.col("b.l_quantity")),
        )
        .select(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
        .distinct()
    )
    edges = pairs.unionAll(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    verts = edges.select(F.col("a").alias("id")).distinct()
    adj = (
        edges.select(F.col("a").alias("id"), F.col("b").alias("nbr"))
        .unionAll(verts.select("id", F.col("id").alias("nbr")))
        .transform(_pin)
    )
    labels = verts.select("id", F.col("id").alias("lbl"))
    # Convergence scalar per superstep (r12, VERDICT r11 item 2):
    # min-label propagation is monotone, so once the label sum stops
    # moving every later round is the identity — break early instead
    # of running the remaining supersteps. Unlike
    # llm._propagate_min_labels this does NOT raise at the ceiling:
    # "exact for diameter <= 4" is this query's DEFINED semantics and
    # the oracle computes the same 4 bounded rounds, so a deeper
    # graph's bounded answer is the contract, not a silent defect.
    prev_sum = None
    for _ in range(4):
        lab = labels.select(F.col("id").alias("nid"), "lbl")
        labels = (
            adj.join(lab, adj.nbr == lab.nid)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.groupBy(F.col("lbl").cast("bigint").alias("component")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min(F.col("id")).cast("bigint").alias("min_member"),
        F.max(F.col("id")).cast("bigint").alias("max_member"),
    )


@register(
    "graph_degree_assortativity",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    ds AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg_s
           FROM edges GROUP BY s),
    dc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS deg_c
           FROM edges GROUP BY c),
    j AS (
      SELECT ds.deg_s AS x, dc.deg_c AS y
      FROM edges e JOIN ds ON e.s = ds.s JOIN dc ON e.c = dc.c
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sx2,
             CAST(SUM(y * y) AS BIGINT) AS sy2
      FROM j
    )
    SELECT n, sx, sy, sxy, sx2, sy2,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE))
            - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
           / (SQRT((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE))
                   - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
              * SQRT((CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE))
                     - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             AS assortativity
    FROM m
    """,
)
def graph_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the supplier-customer trade graph —
    the Pearson correlation of endpoint degrees over edges (Newman
    2002): do high-degree suppliers trade with high-degree customers
    (assortative, r>0) or with the long tail (disassortative, r<0)?
    Edges are the distinct supplier-customer pairs in the fact
    table; each endpoint's degree is its distinct-neighbor count;
    the statistic is derived from six exact BIGINT edge-level moments
    by one closed-form double expression written identically in both
    engines (IEEE divide/multiply/subtract + correctly-rounded SQRT,
    so bit-identical with no rounding step). Degree products are
    bounded (deg <= node count of the other side), keeping every
    moment far inside BIGINT at fixture scale; the docstringed
    headroom rule at 100 TB is the same as every moments op: bin or
    cap degrees so n * max(x*y) stays under 2^63.

    Scale shape: dedup shuffles on the edge key; the two degree
    tables are node-cardinality (tiny relative to edges) and
    broadcast back onto edges, so the moment pass is map-only; the
    final reduce is a single 6-counter aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    ds = edges.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("deg_s"))
    dc = edges.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("deg_c"))
    # degree tables are ENTITY-scale (suppliers/customers grow with
    # SF), so no broadcast HINT — a hint forces the broadcast past
    # any threshold and becomes a driver OOM at 1e9+ entities. Left
    # unhinted, the join keys (s, c) match the groupBy exchanges
    # that built ds/dc, so the shuffle join is co-partitioned (one
    # extra exchange on the edges side only), and AQE still demotes
    # to broadcast when the runtime size is small. Measured at x128:
    # 17.7 s unhinted vs 17.3 s forced -- free at census scale,
    # unbounded-safe at 100 TB (r10 broadcast-hint audit, SCALE.md).
    j = (
        edges.join(ds, "s")
        .join(dc, "c")
        .select(F.col("deg_s").alias("x"), F.col("deg_c").alias("y"))
    )
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x")).cast("long").alias("sx2"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y")).cast("long").alias("sy2"),
    )
    r = """
        ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE))
         - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
        / (SQRT((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE))
                - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
           * SQRT((CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE))
                  - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
    """
    return m.select(
        "n", "sx", "sy", "sxy", "sx2", "sy2", F.expr(r).alias("assortativity")
    )


def _hits_oracle(iters: int) -> str:
    parts = [
        """
    WITH pairs AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    hubs AS (SELECT DISTINCT s FROM pairs),
    h0 AS (SELECT s, CAST(1048576 AS BIGINT) AS h FROM hubs)"""
    ]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(
            f""",
    araw{i} AS (
      SELECT e.p, CAST(SUM({prev_h}.h) AS BIGINT) AS a
      FROM pairs e JOIN {prev_h} ON {prev_h}.s = e.s GROUP BY e.p
    ),
    am{i} AS (SELECT MAX(a) AS amax FROM araw{i}),
    an{i} AS (
      SELECT p, CAST((a * 1048576) // am{i}.amax AS BIGINT) AS a
      FROM araw{i} CROSS JOIN am{i}
    ),
    hraw{i} AS (
      SELECT e.s, CAST(SUM(an{i}.a) AS BIGINT) AS h
      FROM pairs e JOIN an{i} ON an{i}.p = e.p GROUP BY e.s
    ),
    hm{i} AS (SELECT MAX(h) AS hmax FROM hraw{i}),
    hn{i} AS (
      SELECT s, CAST((h * 1048576) // hm{i}.hmax AS BIGINT) AS h
      FROM hraw{i} CROSS JOIN hm{i}
    )"""
        )
        prev_h = f"hn{i}"
    last = iters
    parts.append(
        f"""
    SELECT node_kind, node_key, score_units FROM (
      SELECT 'authority' AS node_kind, CAST(p AS BIGINT) AS node_key,
             a AS score_units FROM an{last}
      UNION ALL
      SELECT 'hub' AS node_kind, CAST(s AS BIGINT) AS node_key,
             h AS score_units FROM hn{last}
    )
    ORDER BY score_units DESC, node_kind, node_key
    LIMIT 20"""
    )
    return "".join(parts)


@register("graph_hits_bipartite", oracle=_hits_oracle(3))
def graph_hits_bipartite(spark, sf_dir):
    """HITS (Kleinberg hubs-and-authorities) over the supplier→part
    procurement graph, 3 fixed supersteps: suppliers are hubs (good
    hubs stock many good parts), parts are authorities (good parts
    are stocked by good hubs). Scores live in integer units
    (2^20 == 1.0) and each half-step renormalizes by the current
    maximum via integer division — a power-of-two numerator over a
    positive BIGINT max, so the truncation is bit-identical
    cross-engine and the iteration can never overflow (degrees are
    bounded by the opposite side's node count; every product stays
    under 2^40). Same fixed-iteration determinism contract as
    graph_pagerank_bipartite (module docstring): unbounded
    convergence loops belong to jobs, not graded queries.

    Scale shape per superstep: the edge list joins the current score
    vector on one side's key then hash-aggs on the other — two
    shuffles on keys a 100-TB deployment would bucket once; the max
    reductions are single-row broadcasts, never a driver collect."""
    li = load_table(spark, sf_dir, "lineitem")
    # consumed twice per superstep (6x total): pin the deduped edge
    # list or every iteration re-runs the scan+distinct upstream
    pairs = (
        li.select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .transform(_pin)
    )
    hubs = pairs.select("s").distinct()
    h = hubs.select("s", F.lit(1048576).cast("bigint").alias("h"))
    a = None
    for _ in range(3):
        araw = (
            pairs.join(h, "s")
            .groupBy("p")
            .agg(F.sum("h").cast("bigint").alias("a"))
        )
        am = araw.agg(F.max("a").alias("amax"))
        # node-cardinality score vectors: truncate lineage each half-
        # step or every broadcast-max subtree replays all prior
        # supersteps (each iteration's plan nests the last one's)
        a = (
            araw.crossJoin(F.broadcast(am))  # bcast: scalar
            .select(
                "p", F.expr("(a * 1048576) div amax").cast("bigint").alias("a")
            )
            .localCheckpoint(eager=False)
        )
        hraw = (
            pairs.join(a, "p")
            .groupBy("s")
            .agg(F.sum("a").cast("bigint").alias("h"))
        )
        hm = hraw.agg(F.max("h").alias("hmax"))
        h = (
            hraw.crossJoin(F.broadcast(hm))  # bcast: scalar
            .select(
                "s", F.expr("(h * 1048576) div hmax").cast("bigint").alias("h")
            )
            .localCheckpoint(eager=False)
        )
    out = a.select(
        F.lit("authority").alias("node_kind"),
        F.col("p").cast("bigint").alias("node_key"),
        F.col("a").alias("score_units"),
    ).unionByName(
        h.select(
            F.lit("hub").alias("node_kind"),
            F.col("s").cast("bigint").alias("node_key"),
            F.col("h").alias("score_units"),
        )
    )
    return out.orderBy(
        F.col("score_units").desc(), "node_kind", "node_key"
    ).limit(20)


@register(
    "graph_random_walk_deterministic",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    edges AS (
      SELECT p * 2 AS src, s * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT s * 2 + 1 AS src, p * 2 AS dst FROM pairs
    ),
    w0 AS (SELECT DISTINCT s * 2 + 1 AS walker, s * 2 + 1 AS cur
           FROM pairs),
    c1 AS (
      SELECT w0.walker, e.dst,
             ROW_NUMBER() OVER (PARTITION BY w0.walker
               ORDER BY ((w0.cur * 31 + e.dst) * 2654435761 + 97)
                        % 2147483647, e.dst) AS rk
      FROM w0 JOIN edges e ON e.src = w0.cur
    ),
    w1 AS (SELECT walker, dst AS cur FROM c1 WHERE rk = 1),
    c2 AS (
      SELECT w1.walker, e.dst,
             ROW_NUMBER() OVER (PARTITION BY w1.walker
               ORDER BY ((w1.cur * 31 + e.dst) * 2654435761 + 194)
                        % 2147483647, e.dst) AS rk
      FROM w1 JOIN edges e ON e.src = w1.cur
    ),
    w2 AS (SELECT walker, dst AS cur FROM c2 WHERE rk = 1),
    c3 AS (
      SELECT w2.walker, e.dst,
             ROW_NUMBER() OVER (PARTITION BY w2.walker
               ORDER BY ((w2.cur * 31 + e.dst) * 2654435761 + 291)
                        % 2147483647, e.dst) AS rk
      FROM w2 JOIN edges e ON e.src = w2.cur
    ),
    w3 AS (SELECT walker, dst AS cur FROM c3 WHERE rk = 1)
    SELECT w0.walker AS start_node,
           CAST(w1.cur AS BIGINT) AS hop1,
           CAST(w2.cur AS BIGINT) AS hop2,
           CAST(w3.cur AS BIGINT) AS hop3
    FROM w0 JOIN w1 ON w1.walker = w0.walker
            JOIN w2 ON w2.walker = w0.walker
            JOIN w3 ON w3.walker = w0.walker
    """,
)
def graph_random_walk_deterministic(spark, sf_dir):
    """Hash-seeded graph walks — the node2vec/DeepWalk corpus
    generator restated for a deterministic engine: from every
    supplier node, take 3 steps where each step picks the neighbor
    minimizing a pure-integer mix of (current node, neighbor, step
    salt). The walk corpus is what a graph-embedding trainer consumes
    (pairs within a window become skip-gram examples); hash seeding
    replaces the RNG so the oracle can restate every choice —
    identical integer multiply/add/mod both engines, ties broken by
    neighbor id. Each step is one edge join + one per-walker argmin
    (rank 1 over the hash order), the superstep shape shared with
    pagerank/HITS/BFS.

    Scale shape: walkers join edges on the current-node key per step
    — 3 shuffles on edge keys, each carrying one row per walker; at
    100 TB you run W walkers per node and the join fans out W-fold,
    still linear in walks. No driver state, no RNG."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    edges = pairs.select(
        (F.col("p") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionByName(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("p") * 2).alias("dst")
        )
    ).transform(_pin)
    w = pairs.select((F.col("s") * 2 + 1).alias("walker")).distinct().select(
        "walker", F.col("walker").alias("cur")
    )
    hops = []
    for step in (1, 2, 3):
        salt = 97 * step
        cand = w.join(edges, w.cur == edges.src).select(
            "walker",
            "dst",
            F.expr(
                f"((cur * 31 + dst) * 2654435761 + {salt}) % 2147483647"
            ).alias("h"),
        )
        pick = (
            cand.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("walker").orderBy("h", "dst")
                ),
            )
            .filter(F.col("rk") == 1)
            .select("walker", F.col("dst").alias("cur"))
            .localCheckpoint(eager=False)
        )
        hops.append(pick)
        w = pick
    out = hops[0].select("walker", F.col("cur").alias("hop1"))
    out = out.join(
        hops[1].select("walker", F.col("cur").alias("hop2")), "walker"
    ).join(hops[2].select("walker", F.col("cur").alias("hop3")), "walker")
    return out.select(
        F.col("walker").alias("start_node"),
        F.col("hop1").cast("bigint"),
        F.col("hop2").cast("bigint"),
        F.col("hop3").cast("bigint"),
    )


@register(
    "graph_kcore_2step",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey
       AND l1.l_partkey < l2.l_partkey
       AND l1.l_quantity = l2.l_quantity
    ),
    edges AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
    deg0 AS (SELECT a AS id, COUNT(*) AS d FROM edges GROUP BY a),
    alive1 AS (SELECT id FROM deg0 WHERE d >= 3),
    e1 AS (
      SELECT e.a, e.b FROM edges e
      JOIN alive1 x ON e.a = x.id
      JOIN alive1 y ON e.b = y.id
    ),
    deg1 AS (SELECT a AS id, COUNT(*) AS d FROM e1 GROUP BY a),
    alive2 AS (SELECT id FROM deg1 WHERE d >= 3),
    e2 AS (
      SELECT e.a, e.b FROM e1 e
      JOIN alive2 x ON e.a = x.id
      JOIN alive2 y ON e.b = y.id
    ),
    deg2 AS (SELECT a AS id, COUNT(*) AS d FROM e2 GROUP BY a)
    SELECT CAST(d0.id AS BIGINT) AS part_id,
           CAST(d0.d AS BIGINT) AS degree0,
           CAST(COALESCE(d1.d, 0) AS BIGINT) AS degree1,
           CAST(COALESCE(d2.d, 0) AS BIGINT) AS degree2,
           CAST(CASE WHEN d2.d >= 3 THEN 1 ELSE 0 END AS INT)
             AS in_core_after_2
    FROM deg0 d0
    LEFT JOIN deg1 d1 ON d1.id = d0.id
    LEFT JOIN deg2 d2 ON d2.id = d0.id
    """,
)
def graph_kcore_2step(spark, sf_dir):
    """Bounded k-core decomposition (k = 3, two synchronized peeling
    rounds) — the degeneracy peel behind community cores, spam-ring
    detection, and graph sparsification: repeatedly delete vertices
    of degree < k; what survives is the k-core. Full peeling loops
    to a fixed point; here the round count is FIXED at 2 (the same
    bounded-superstep decision as graph_connected_components /
    graph_bfs_hops) so the query is deterministic and fully
    SQL-oracle-checkable: after round r, degrees are exact for the
    'peel ≤ r' prefix of the decomposition, and ``in_core_after_2``
    is the membership state a third round would start from. The
    graph is the same equal-quantity co-purchase graph the CC and
    triangle ops use.

    Scale shape: each round is degree-agg (map-side combined) →
    filter (the Aggregate-reduced alive set) → two hash semi-shaped
    joins re-keying the edge list on each endpoint — the standard
    Pregel peel, every stage equality-keyed and parallel, state one
    row per vertex. The edge list is derived once and pinned
    (io.pin, DISK_ONLY) so both rounds and the final report read one
    materialization instead of re-running the co-purchase self-join
    five times. No step's parallelism depends on core size; at
    100 TB the peel is the same two shuffles per round GraphX's
    aggregateMessages would emit."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey"))
            & (F.col("a.l_quantity") == F.col("b.l_quantity")),
        )
        .select(
            F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b")
        )
        .distinct()
    )
    edges = pairs.unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).transform(_pin)

    def _deg(e):
        return e.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("d"))

    def _prune(e, alive):
        return (
            e.join(alive.select(F.col("id").alias("a")), "a")
            .join(alive.select(F.col("id").alias("b")), "b")
            .select("a", "b")
        )

    deg0 = _deg(edges)
    alive1 = deg0.filter(F.col("d") >= 3).select("id")
    e1 = _prune(edges, alive1)
    deg1 = _deg(e1)
    alive2 = deg1.filter(F.col("d") >= 3).select("id")
    e2 = _prune(e1, alive2)
    deg2 = _deg(e2)
    return (
        deg0.select(F.col("id"), F.col("d").alias("degree0"))
        .join(deg1.select("id", F.col("d").alias("d1")), "id", "left")
        .join(deg2.select("id", F.col("d").alias("d2")), "id", "left")
        .select(
            F.col("id").cast("bigint").alias("part_id"),
            F.col("degree0").cast("bigint"),
            F.coalesce(F.col("d1"), F.lit(0)).cast("bigint").alias("degree1"),
            F.coalesce(F.col("d2"), F.lit(0)).cast("bigint").alias("degree2"),
            F.when(F.col("d2") >= 3, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("in_core_after_2"),
        )
    )
