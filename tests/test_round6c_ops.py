"""Invariant tests for the round-6 batch-14 operators (SURVEY.md
§5.3): conservation laws, policy recomputation in plain Python, and
cross-operator consistency — the checks the SQL oracle can't express
because it restates the same algebra.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.io import load_table

load_all()

_TTL_CUTOFF = dt.datetime(2024, 1, 30) - dt.timedelta(days=7)


def test_version_gc_policy_partitions_cells(spark, sf_dir):
    """The four verdicts partition the cell log exactly, and every
    coordinate retains exactly one MIN_VERSIONS cell — keep_min per
    family must equal that family's distinct-coordinate count."""
    rows = QUERIES["cells_version_gc_policy"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    coords = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    total = 0
    for r in rows:
        assert r.keep_min + r.keep_live + r.drop_ttl + r.drop_versions == r.n_cells
        assert r.keep_min == coords[r.event_type]
        total += r.n_cells
    assert total == ev.count()


def test_version_gc_min_versions_outranks_ttl(spark, sf_dir):
    """MIN_VERSIONS semantics: a coordinate whose NEWEST cell is
    TTL-expired still keeps it (verdict keep_min, not drop_ttl) —
    recomputed in plain Python over the raw log."""
    ev = load_table(spark, sf_dir, "events").collect()
    newest: dict[tuple, tuple] = {}
    for e in ev:
        k = (e.user_id, e.event_type)
        v = (e.ts, e.event_id)
        if k not in newest or v > newest[k]:
            newest[k] = v
    stale_coords = [k for k, v in newest.items() if v[0] < _TTL_CUTOFF]
    if not stale_coords:  # fixture-dependent; sf0.001 always has some
        return
    # those coordinates' newest cells are counted under keep_min, so
    # drop_ttl for the family must be strictly less than its count of
    # expired cells (at least one expired cell per stale coord is kept)
    rows = {r.event_type: r for r in QUERIES["cells_version_gc_policy"](spark, sf_dir).collect()}
    expired_by_fam: dict[str, int] = {}
    for e in ev:
        if e.ts < _TTL_CUTOFF:
            expired_by_fam[e.event_type] = expired_by_fam.get(e.event_type, 0) + 1
    stale_by_fam: dict[str, int] = {}
    for (_, fam), v in newest.items():
        if v[0] < _TTL_CUTOFF:
            stale_by_fam[fam] = stale_by_fam.get(fam, 0) + 1
    for fam, n_stale in stale_by_fam.items():
        assert rows[fam].drop_ttl == expired_by_fam[fam] - n_stale


def test_wal_rollover_conserves_bytes_and_entries(spark, sf_dir):
    """Segments tile each server's WAL: entry counts and bytes sum
    back to the raw per-server totals, segment ids are contiguous
    from 0, and every segment but the last closes at or past the cap
    boundary it rolled on."""
    rows = QUERIES["wal_rollover_plan"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    raw = {
        r.server: (r.n, r.b)
        for r in ev.select(
            (F.col("user_id") % 4).alias("server"),
            (F.lit(64) + F.length("props")).alias("eb"),
        )
        .groupBy("server")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("eb").alias("b"))
        .collect()
    }
    by_server: dict[int, list] = {}
    for r in rows:
        by_server.setdefault(r.server, []).append(r)
    assert set(by_server) == set(raw)
    for server, segs in by_server.items():
        segs.sort(key=lambda r: r.segment)
        assert [s.segment for s in segs] == list(range(len(segs)))
        assert sum(s.n_entries for s in segs) == raw[server][0]
        assert sum(s.seg_bytes for s in segs) == raw[server][1]
        for s in segs[:-1]:
            # the next segment starts past this one's cap boundary
            assert s.cum_bytes_end > (s.segment + 1) * 32768 - 32768


def test_column_pagination_pages_within_rows(spark, sf_dir):
    """Per rowkey: at most `limit`=2 columns, ranks exactly from the
    {offset+1..offset+limit} page, and the returned qualifiers are
    precisely positions 2-3 of the row's sorted qualifier list."""
    rows = QUERIES["cells_column_pagination"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    quals: dict[int, list[str]] = {
        r.user_id: sorted(r.qs)
        for r in ev.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("qs"))
        .collect()
    }
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.col_rank in (2, 3)
        by_user.setdefault(r.user_id, []).append(r)
    for uid, got in by_user.items():
        assert len(got) <= 2
        expect = quals[uid][1:3]
        assert sorted(r.event_type for r in got) == sorted(expect)
    # every row with >= 2 qualifiers produces a page
    assert set(by_user) == {u for u, q in quals.items() if len(q) >= 2}


def test_snapshot_diff_partitions_t2_snapshot(spark, sf_dir):
    """added + changed + unchanged must equal the t2 snapshot's
    coordinate count per family (append-only log: nothing is ever
    removed), and `added` equals the coordinates born in (t1, t2]."""
    rows = QUERIES["snapshot_diff_asof"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    t1 = dt.datetime(2024, 1, 10)
    t2 = dt.datetime(2024, 1, 20)
    per = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("born"))
        .filter(F.col("born") <= F.lit(t2))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_t2"),
            F.sum(F.when(F.col("born") > F.lit(t1), 1).otherwise(0)).alias("n_new"),
        )
        .collect()
    )
    raw = {r.event_type: (r.n_t2, r.n_new) for r in per}
    for r in rows:
        n_t2, n_new = raw[r.event_type]
        assert r.n_added + r.n_changed + r.n_unchanged == n_t2
        assert r.n_added == n_new


def test_fuzzy_rowkey_mask_recompute(spark, sf_dir):
    """The fuzzy mask is a pure arithmetic property of the key:
    digits (hundreds, tens) == 42 and units == 7 — recomputed
    directly on the integer keys, plus exhaustive count parity."""
    rows = QUERIES["scan_fuzzy_rowkey"](spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    expect = {
        r.o_orderkey
        for r in orders.filter(
            (F.col("o_orderkey") % 1000 - F.col("o_orderkey") % 10 == 420)
            & (F.col("o_orderkey") % 10 == 7)
        ).collect()
    }
    got = {r.o_orderkey for r in rows}
    assert got == expect
    for r in rows:
        assert len(r.rowkey) == 10
        assert int(r.rowkey) == r.o_orderkey


def test_mob_routing_conserves_bytes(spark, sf_dir):
    """MOB routing partitions every family's byte total exactly
    (mob_bytes + inline_bytes == total), the bps share recomputes by
    integer cross-multiply, and mob_dominant is exactly the >50 %
    comparison — all recomputed in plain Python over the raw table."""
    rows = QUERIES["cells_mob_storage_plan"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    agg: dict[str, list[int]] = {}
    for d in docs:
        a = agg.setdefault(d.source, [0, 0, 0, 0])  # cells, mob_cells, mob_b, inline_b
        a[0] += 1
        if d.n_chars > 256:
            a[1] += 1
            a[2] += d.n_chars
        else:
            a[3] += d.n_chars
    assert {r.source for r in rows} == set(agg)
    for r in rows:
        cells, mc, mb, ib = agg[r.source]
        assert (r.n_cells, r.mob_cells, r.mob_bytes, r.inline_bytes) == (cells, mc, mb, ib)
        assert r.mob_bps == mb * 10000 // max(mb + ib, 1)
        assert r.mob_dominant == (mb * 2 > mb + ib)


def test_replication_lag_watermark_recompute(spark, sf_dir):
    """The queue census recomputes from the raw log: pending = edits
    newer than max(ts) − 3 days, oldest age = exact integer seconds
    back to the oldest pending edit, and entry counts conserve."""
    rows = QUERIES["wal_replication_lag_report"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").collect()
    now = max(e.ts for e in ev)
    cutoff = now - dt.timedelta(days=3)
    agg: dict[int, list] = {}
    for e in ev:
        a = agg.setdefault(e.user_id % 4, [0, 0, None])
        a[0] += 1
        if e.ts > cutoff:
            a[1] += 1
            if a[2] is None or e.ts < a[2]:
                a[2] = e.ts
    assert {r.server_id for r in rows} == set(agg)
    assert sum(r.wal_entries for r in rows) == len(ev)
    for r in rows:
        n, pend, oldest = agg[r.server_id]
        assert (r.wal_entries, r.pending_entries) == (n, pend)
        want_age = 0 if oldest is None else int((now - oldest).total_seconds())
        assert r.oldest_pending_age_s == want_age
        assert r.backlogged == (pend * 10 > n)


def test_split_policy_cubic_ramp(spark, sf_dir):
    """The split threshold recomputes from R alone — threshold(R) =
    min(256 KiB, 2·16 KiB·R³) — and will_split is exactly the size
    comparison; server fan-out (1/2/4/9 regions) must match the
    fixture's skewed placement map."""
    rows = QUERIES["layout_region_split_policy_sim"](spark, sf_dir).collect()
    placement = {r: (0 if r < 1 else 1 if r < 3 else 2 if r < 7 else 3) for r in range(16)}
    present = {r.region for r in rows}
    hosted: dict[int, int] = {}
    for reg in present:
        s = placement[reg]
        hosted[s] = hosted.get(s, 0) + 1
    for r in rows:
        assert r.server == placement[r.region]
        assert r.regions_on_server == hosted[r.server]
        thr = min(262144, 2 * 16384 * r.regions_on_server**3)
        assert r.split_threshold == thr
        assert r.will_split == (r.region_bytes > thr)
