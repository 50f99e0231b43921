"""Invariant tests for the round-6 batch-7..10 operators
(SURVEY.md §5.3): conservation laws, cross-operator consistency,
and independent pandas recomputation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.io import load_table

load_all()


def test_delete_marker_precedence_conserves_cells(spark, sf_dir):
    """Every cell is attributed to exactly one verdict, so the four
    masked/surviving columns must sum back to n_cells per family,
    and the family totals must sum to the raw cell-log count."""
    rows = QUERIES["cells_delete_marker_precedence"](spark, sf_dir).collect()
    total = 0
    for r in rows:
        assert r.fam_masked + r.col_masked + r.ver_masked + r.surviving == r.n_cells
        total += r.n_cells
    assert total == load_table(spark, sf_dir, "events").count()


def test_wal_gap_audit_rediscovers_lost_edits(spark, sf_dir):
    """The audit's per-region missing_interior (span minus survivors)
    must equal the number of interior edits the harness dropped
    (event_id % 101 == 0 that are not a region's first/last seqid) —
    the audit is graded against the loss we injected."""
    rows = {r.region: r for r in QUERIES["txlog_replay_gap_audit"](spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select((F.col("user_id") % 8).alias("region"), "event_id")
        .collect()
    )
    by_region: dict[int, list[int]] = {}
    for r in ev:
        by_region.setdefault(r.region, []).append(r.event_id)
    for region, ids in by_region.items():
        ids.sort()
        seq = {eid: i + 1 for i, eid in enumerate(ids)}
        survivors = [seq[e] for e in ids if e % 101 != 0]
        got = rows[region]
        assert got.n_entries == len(survivors)
        assert got.first_seqid == min(survivors)
        assert got.last_seqid == max(survivors)
        assert got.missing_interior == (max(survivors) - min(survivors) + 1) - len(survivors)


def test_meta_lookup_routes_every_probe_once(spark, sf_dir):
    """Region routing is a partition of the probe stream: per-region
    probe counts must sum to the orders row count, and region key
    ranges must tile without overlap (end_i == start_{i+1})."""
    rows = sorted(
        QUERIES["layout_meta_lookup"](spark, sf_dir).collect(),
        key=lambda r: r.region_idx,
    )
    assert sum(r.n_probes for r in rows) == load_table(spark, sf_dir, "orders").count()
    for a, b in zip(rows, rows[1:]):
        assert b.region_idx == a.region_idx + 1
        assert a.end_key == b.start_key
    assert rows[0].start_key is None and rows[-1].end_key is None


def test_theta_sketch_union_and_error(spark, sf_dir):
    """The ALL row is the union sketch: its exact count equals the
    global distinct, every filled segment's estimate lands within
    the KMV error envelope (generous 3/sqrt(k) band), and unfilled
    sketches ARE exact."""
    rows = {r.segment: r for r in QUERIES["agg_theta_sketch_users"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    assert rows["ALL"].n_exact == ev.select("user_id").distinct().count()
    for seg, r in rows.items():
        if r.kth_hash is None:
            assert r.theta_est == float(r.n_exact)
        else:
            rel = abs(r.theta_est - r.n_exact) / r.n_exact
            assert rel < 3.0 / (64 ** 0.5), (seg, rel)


def test_scene_cut_frames_match_frame_sample(spark, sf_dir):
    """Cross-operator consistency: the scene report's per-doc frame
    count must equal multimodal_frame_sample's fan-out for the same
    doc, and scenes = cuts + 1 by construction."""
    scenes = {r.doc_id: r for r in QUERIES["multimodal_scene_cut_detect"](spark, sf_dir).collect()}
    frames = {
        r.doc_id: r.n
        for r in QUERIES["multimodal_frame_sample"](spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(scenes) == set(frames)
    for doc_id, r in scenes.items():
        assert r.n_frames == frames[doc_id]
        assert r.longest_scene <= r.n_frames
        assert r.n_cuts <= r.n_frames - 1


def test_vad_segments_bounded_by_energy_frames(spark, sf_dir):
    """Voiced frames are a subset of energy frames; segment counts
    and lengths obey the islands arithmetic."""
    vad = QUERIES["multimodal_audio_vad_segments"](spark, sf_dir).collect()
    en = {
        r.doc_id: r.n
        for r in QUERIES["multimodal_audio_energy"](spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in vad:
        assert r.n_voiced_frames <= en[r.doc_id]
        assert 1 <= r.n_segments <= r.n_voiced_frames
        assert r.longest_segment <= r.n_voiced_frames
        assert r.n_voiced_frames <= r.n_segments * r.longest_segment


def test_bollinger_flags_match_float_bands(spark, sf_dir):
    """The integer predicate must agree with the float 2-sigma band
    computed independently in pandas (away from exact boundaries the
    two are identical; the integer form exists so boundaries can't
    flip cross-engine)."""
    import pandas as pd

    rows = QUERIES["win_bollinger_breakout"](spark, sf_dir).collect()
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .toPandas()
    )
    o["cents"] = (o.o_totalprice * 100 + 0.5).apply(int)
    got = {r.o_custkey: (r.n_windows, r.n_up, r.n_down) for r in rows}
    for ck, g in o.sort_values(["o_orderdate", "o_orderkey"]).groupby("o_custkey"):
        c = g.cents.to_numpy()
        if len(c) < 8:
            assert ck not in got
            continue
        up = down = wins = 0
        for i in range(7, len(c)):
            w = c[i - 7 : i + 1]
            s1, s2 = int(w.sum()), int((w.astype(object) ** 2).sum())
            dev = 8 * int(c[i]) - s1
            wide = dev * dev > 4 * (8 * s2 - s1 * s1)
            wins += 1
            up += 1 if (dev > 0 and wide) else 0
            down += 1 if (dev < 0 and wide) else 0
        assert got[ck] == (wins, up, down)


def test_wilson_rank_is_permutation_and_bounded(spark, sf_dir):
    """Ranks are a 1..n permutation; the lower bound sits inside
    [0, p-hat]."""
    rows = QUERIES["events_ctr_wilson_rank"](spark, sf_dir).collect()
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    for r in rows:
        p = min(r.clicks, r.impressions) / r.impressions
        assert 0.0 <= r.wilson_lb <= p + 1e-12


def test_hdr_histogram_p99_bucket_is_correct(spark, sf_dir):
    """Exactly one bucket holds p99; its bound brackets the true
    exact p99 computed by sorting; counts conserve."""
    rows = sorted(
        QUERIES["agg_hdr_histogram_p99"](spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    o = load_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    cents = sorted(int(v * 100 + 0.5) for v in o.o_totalprice)
    assert sum(r.cnt for r in rows) == len(cents)
    marked = [r for r in rows if r.holds_p99 == 1]
    assert len(marked) == 1
    true_p99 = cents[((len(cents) * 99 + 99) // 100) - 1]
    b = marked[0]
    assert b.lo_cents <= true_p99 < 2 * b.lo_cents


def test_neyman_allocation_shares(spark, sf_dir):
    """Floor shares under-shoot the budget by < n_strata; remainders
    are valid largest-remainder inputs (0 <= rem < sum_w)."""
    rows = QUERIES["sample_neyman_allocation"](spark, sf_dir).collect()
    total = sum(r.alloc_floor for r in rows)
    assert 1000 - len(rows) < total <= 1000
    sum_w = None
    for r in rows:
        assert r.remainder_num >= 0
    # reconstruct sum_w from any row: 1000*w = floor*sum_w + rem
    r0 = max(rows, key=lambda r: r.w_int)
    if r0.alloc_floor:
        sum_w = (1000 * r0.w_int - r0.remainder_num) // r0.alloc_floor
        for r in rows:
            assert 1000 * r.w_int == r.alloc_floor * sum_w + r.remainder_num


def test_kendall_tau_pair_conservation(spark, sf_dir):
    """C + D + ties == n_pairs == n(n-1)/2."""
    r = QUERIES["events_kendall_tau_campaigns"](spark, sf_dir).collect()[0]
    assert r.concordant + r.discordant + r.ties == r.n_pairs
    assert r.n_pairs == r.n_camps * (r.n_camps - 1) // 2
    assert -1_000_000 <= r.tau_a_micro <= 1_000_000


def test_skyline_is_exactly_the_nondominated_set(spark, sf_dir):
    """Independent O(n^2) pandas recomputation of strict 2-D
    dominance must produce the identical frontier."""
    got = {
        (r.o_custkey, r.avg_cents, r.n_orders)
        for r in QUERIES["orders_skyline_customers"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").toPandas()
    o["cents"] = (o.o_totalprice * 100 + 0.5).apply(int)
    agg = o.groupby("o_custkey").agg(s=("cents", "sum"), n=("cents", "count"))
    pts = [(ck, s // n, n) for ck, (s, n) in agg.iterrows()]
    expect = {
        (ck, a, n)
        for ck, a, n in pts
        if not any(a2 > a and n2 > n for _, a2, n2 in pts)
    }
    assert got == expect


def test_jaccard_nation_trade_bounds(spark, sf_dir):
    """Intersection bounded by both set sizes; micro-Jaccard in
    (0, 1e6]; pair key ordered."""
    for r in QUERIES["graph_jaccard_nation_trade"](spark, sf_dir).collect():
        assert r.n1 < r.n2
        assert 0 < r.n_common <= min(r.a_parts, r.b_parts)
        assert 0 < r.jaccard_micro <= 1_000_000


def test_business_days_against_python_calendar(spark, sf_dir):
    """Weekday counts recomputed with datetime.weekday() over the
    raw interval must reproduce each group's totals exactly."""
    import datetime as dt

    got = {r.o_orderpriority: r for r in QUERIES["fn_business_days"](spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select("o_orderpriority", "o_orderdate", "l_shipdate")
        .collect()
    )
    agg: dict[str, list[int]] = {}
    for r in rows:
        d1, d2 = r.o_orderdate.date(), r.l_shipdate.date()
        n = sum(
            1
            for k in range((d2 - d1).days)
            if (d1 + dt.timedelta(days=k)).weekday() < 5
        )
        agg.setdefault(r.o_orderpriority, []).append(n)
    for prio, vals in agg.items():
        g = got[prio]
        assert g.n_lines == len(vals)
        assert g.total_busdays == sum(vals)
        assert g.max_busdays == max(vals)


def test_pq_adc_recall_bounds_and_exact_top1(spark, sf_dir):
    """Recall in [0, 1000*10]; the exact top-1 must agree with a
    numpy brute-force on the same integer grid."""
    import numpy as np

    rows = QUERIES["sim_pq_adc_recall"](spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in e])
    m = np.floor(np.array([r.embedding for r in e], dtype="float64") * 64 + 0.5).astype("int64")
    for r in rows:
        assert 0 <= r.n_overlap <= 10
        assert r.recall_bp == r.n_overlap * 1000
        qi = np.where(ids == r.q_id)[0][0]
        d = ((m - m[qi]) ** 2).sum(axis=1)
        d[qi] = 2**62
        order = np.lexsort((ids, d))
        assert ids[order[0]] == r.exact_top1


def test_simpson_diversity_rational(spark, sf_dir):
    """Simpson numerator/denominator recomputed in pandas must give
    the identical integer micro value."""
    got = {r.nationkey: r for r in QUERIES["agg_simpson_diversity"](spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders").select("o_custkey").toPandas()
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for nk, g in j.groupby("c_nationkey"):
        n_i = g.groupby("o_custkey").size()
        N = int(n_i.sum())
        if N < 2:
            assert nk not in got
            continue
        num = int((n_i * (n_i - 1)).sum())
        assert got[nk].simpson_micro == num * 1_000_000 // (N * (N - 1))
        assert got[nk].n_customers == len(n_i)


def test_abc_xyz_matrix_partitions_parts(spark, sf_dir):
    """The matrix cells partition the part dimension: n_parts sums
    to the distinct part count, revenue to total revenue, and A-class
    revenue share is >= any other ABC class's."""
    rows = QUERIES["orders_abc_xyz_matrix"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_parts for r in rows) == n_parts
    by_abc: dict[str, int] = {}
    for r in rows:
        by_abc[r.abc] = by_abc.get(r.abc, 0) + r.rev_cents
    assert by_abc["A"] == max(by_abc.values())


def test_autocorr_and_mann_kendall_agree_on_direction(spark, sf_dir):
    """Two independent trend/persistence statistics over the same
    daily series: bounded ranges and pair-count consistency."""
    ac = QUERIES["events_autocorr_lag1"](spark, sf_dir).collect()[0]
    mk = QUERIES["events_mann_kendall_trend"](spark, sf_dir).collect()[0]
    assert ac.n_pairs == ac.n_days - 1
    assert -1_000_000 <= ac.autocorr_micro <= 1_000_000
    assert mk.n_days == ac.n_days
    assert abs(mk.s_stat) <= mk.n_days * (mk.n_days - 1) // 2
    assert mk.var18 > 0


def test_compaction_reclaim_consistent_with_policy_ops(spark, sf_dir):
    """Cross-operator: keep + drops == total cells; the TTL drop
    count must equal the complement of ttl_expiry's survivors."""
    rows = QUERIES["cells_compaction_reclaim_preview"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_cells for r in rows) == total
    for r in rows:
        assert r.drop_ttl + r.drop_versions + r.keep == r.n_cells
    ttl_survivors = QUERIES["ttl_expiry"](spark, sf_dir).count()
    assert sum(r.drop_ttl for r in rows) == total - ttl_survivors


def test_parkinson_terms_nonnegative_and_recomputable(spark, sf_dir):
    """ln²(H/L) >= 0 so the nano sum and sigma are nonnegative;
    recompute one group's sum in pandas."""
    import math

    rows = QUERIES["win_parkinson_volatility"](spark, sf_dir).collect()
    assert all(r.sum_nano >= 0 and r.parkinson_micro >= 0 for r in rows)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 0))
        .select("ts", "value")
        .toPandas()
    )
    ev["day"] = ev.ts.dt.date
    g = ev.groupby("day").value.agg(["max", "min"])
    g = g[g["min"] > 0]
    expect = sum(
        int(1e9 * math.log(h / l) * math.log(h / l)) for h, l in zip(g["max"], g["min"])
    )
    got = {r.event_type: r.sum_nano for r in rows}["purchase"]
    assert got == expect


def test_mix_temperature_compresses_shares(spark, sf_dir):
    """T=2 shares must be strictly less spread than raw shares
    (max share shrinks, min share grows) and both sum to ~10000."""
    rows = QUERIES["pipeline_mix_temperature_shares"](spark, sf_dir).collect()
    raw = [r.raw_share_bps for r in rows]
    t2 = [r.t2_share_bps for r in rows]
    assert max(t2) <= max(raw)
    assert min(t2) >= min(raw)
    assert abs(sum(raw) - 10000) < len(rows)
    assert abs(sum(t2) - 10000) < len(rows)
    for r in rows:
        assert r.uplift_bps == r.t2_share_bps - r.raw_share_bps


def test_time_decay_attribution_weights_valid(spark, sf_dir):
    """Every credit weight is one of the 7 dyadic values; shares sum
    to ~10000 bps."""
    rows = QUERIES["events_attribution_time_decay"](spark, sf_dir).collect()
    assert abs(sum(r.share_bps for r in rows) - 10000) < len(rows) + 1
    valid = {1_000_000 // (2 ** d) for d in range(7)}
    for r in rows:
        # credit_micro is a sum of valid weights: bounded by count * max
        assert 0 < r.credit_micro <= r.n_credits * 1_000_000
        assert r.credit_micro >= r.n_credits * min(valid)


def test_drawdown_duration_against_pandas(spark, sf_dir):
    """Full pandas recomputation of spells for every user."""
    got = {r.user_id: (r.n_spells, r.underwater_events, r.longest_spell)
           for r in QUERIES["win_drawdown_duration"](spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .toPandas()
    )
    ev["cents"] = (ev.value * 100 + 0.5).apply(int)
    ev["flow"] = ev.apply(lambda r: r.cents if r.event_type == "purchase" else -r.cents, axis=1)
    expect = {}
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        eq = g.flow.cumsum()
        peak = eq.cummax()
        under = (eq < peak).to_numpy()
        spells = []
        run = 0
        for u in under:
            if u:
                run += 1
            elif run:
                spells.append(run); run = 0
        if run:
            spells.append(run)
        if spells:
            expect[uid] = (len(spells), sum(spells), max(spells))
    assert got == expect


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """A bloom filter can never miss a true duplicate: maybe_dups >=
    true_dups, and false_positives == maybe - true."""
    r = QUERIES["dedup_bloom_prefilter_audit"](spark, sf_dir).collect()[0]
    assert r.maybe_dups >= r.true_dups
    assert r.false_positives == r.maybe_dups - r.true_dups
    assert r.n_probes > 0
    assert 0 <= r.fp_bps <= 10000
