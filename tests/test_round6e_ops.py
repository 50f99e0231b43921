"""Invariant tests for the round-6 batch-16 operators (SURVEY.md
§5.3): plain-Python/pandas recomputation of the indicator math,
conservation laws over the bulkload plan, and statistical
cross-checks against numpy — properties the SQL oracle can't express
because it restates the same algebra.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.io import load_table

load_all()


def test_rsi_bounds_and_python_recompute(spark, sf_dir):
    """RSI is in [0, 10000] bps, and a plain-Python sliding-window
    recompute over one priority's daily closes reproduces every row."""
    rows = QUERIES["win_rsi_cutler"](spark, sf_dir).collect()
    assert rows and all(0 <= r.rsi_bps <= 10000 for r in rows)
    pri = rows[0].priority
    o = load_table(spark, sf_dir, "orders")
    bars = (
        o.filter(F.col("o_orderpriority") == pri)
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .alias("c")
        )
        .orderBy("o_orderdate")
        .collect()
    )
    closes = [r.c for r in bars]
    days = [r.o_orderdate for r in bars]
    diffs = [b - a for a, b in zip(closes, closes[1:])]
    want = {}
    for i in range(13, len(diffs)):
        win = diffs[i - 13 : i + 1]
        g = sum(d for d in win if d > 0)
        l = sum(-d for d in win if d < 0)
        want[days[i + 1]] = (g, l, 5000 if g + l == 0 else 10000 * g // (g + l))
    got = {r.day: (r.gain_c, r.loss_c, r.rsi_bps) for r in rows if r.priority == pri}
    assert got == want


def test_stochastic_k_envelope_and_d_smoothing(spark, sf_dir):
    """%K sits inside [0, 10000] with close inside the reported
    envelope, and %D is the truncated mean of the three trailing %K
    values (recomputed per event_type from the returned rows plus the
    two warm-up %K bars before the cut)."""
    out = QUERIES["win_stochastic_oscillator"](spark, sf_dir)
    rows = sorted(out.collect(), key=lambda r: (r.event_type, r.day))
    assert rows
    for r in rows:
        assert 0 <= r.k_bps <= 10000
        assert r.ll <= r.close_c <= r.hh
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        # %D of row i uses k of rows i-2..i once past the first two
        # returned rows (earlier rows depend on pre-cut %K warm-up).
        for i in range(2, len(rs)):
            k3 = rs[i - 2].k_bps + rs[i - 1].k_bps + rs[i].k_bps
            assert rs[i].d_bps == k3 // 3


def test_skewness_kurtosis_matches_numpy(spark, sf_dir):
    """Shape statistics agree with a numpy recompute from raw
    quantities (population formulas) to float tolerance, and the
    integer power sums are exactly pandas' sums."""
    import numpy as np
    import pandas as pd

    rows = QUERIES["agg_skewness_kurtosis"](spark, sf_dir).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .toPandas()
    )
    li["v"] = np.floor(li.l_quantity + 0.5).astype("int64")
    for r in rows:
        v = li[(li.l_returnflag == r.l_returnflag) & (li.l_linestatus == r.l_linestatus)].v.to_numpy()
        assert r.n == len(v)
        assert r.s1 == int(v.sum())
        assert r.s4 == int((v.astype(object) ** 4).sum())
        mu = v.mean()
        m2 = ((v - mu) ** 2).mean()
        m3 = ((v - mu) ** 3).mean()
        m4 = ((v - mu) ** 4).mean()
        assert abs(r.skewness - m3 / m2**1.5) < 1e-9
        assert abs(r.kurtosis_excess - (m4 / m2**2 - 3)) < 1e-9


def test_assortativity_matches_pandas_corr(spark, sf_dir):
    """Edge count equals the distinct supplier-customer pair count
    and the coefficient equals pandas' Pearson corr over endpoint
    degrees (different summation order, so float tolerance)."""
    r = QUERIES["graph_degree_assortativity"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_suppkey", "o_custkey")
        .distinct()
        .toPandas()
    )
    assert r.n == len(edges)
    ds = edges.groupby("l_suppkey").size()
    dc = edges.groupby("o_custkey").size()
    x = edges.l_suppkey.map(ds).astype(float)
    y = edges.o_custkey.map(dc).astype(float)
    assert abs(r.assortativity - x.corr(y)) < 1e-9
    assert -1.0 <= r.assortativity <= 1.0


def test_balancer_cost_recompute_and_region_conservation(spark, sf_dir):
    """Server rows conserve regions and requests, and every skew/cost
    column equals the integer recompute from the per-server totals."""
    rows = QUERIES["layout_balancer_cost_model"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_regions = o.select(F.expr("o_custkey div 32")).distinct().count()
    assert sum(r.n_regions for r in rows) == n_regions
    assert sum(r.total_reqs for r in rows) == o.count()
    maxr = max(r.n_regions for r in rows)
    minr = min(r.n_regions for r in rows)
    maxb = max(r.total_bytes for r in rows)
    minb = min(r.total_bytes for r in rows)
    cs = (maxr - minr) * 10000 // maxr
    ss = (maxb - minb) * 10000 // maxb
    for r in rows:
        assert r.count_skew_bps == cs
        assert r.size_skew_bps == ss
        assert r.cluster_cost_bps == (6 * cs + 4 * ss) // 10


def test_bulkload_plan_conservation_and_sortedness(spark, sf_dir):
    """HFile plan conserves bytes and KV counts, never crosses a
    region boundary, respects the 8 KiB cut (up to one straddling
    KV), and files are key-ordered within each region."""
    rows = QUERIES["cells_bulkload_hfile_plan"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    tot = ev.select(
        F.sum(F.lit(32) + F.length("event_type") + F.length("props")).alias("b"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert sum(r.file_bytes for r in rows) == tot.b
    assert sum(r.n_kvs for r in rows) == tot.n
    max_kv = ev.select(
        F.max(F.lit(32) + F.length("event_type") + F.length("props"))
    ).collect()[0][0]
    by_region = {}
    for r in rows:
        assert r.first_key // 16 == r.region and r.last_key // 16 == r.region
        assert r.first_key <= r.last_key
        assert r.file_bytes <= 8192 + max_kv
        by_region.setdefault(r.region, []).append(r)
    for region, fs in by_region.items():
        fs.sort(key=lambda r: r.hfile)
        assert [f.hfile for f in fs] == list(range(len(fs)))
        for a, b in zip(fs, fs[1:]):
            assert a.last_key <= b.first_key


def test_xcorr_lag0_is_pearson_and_bounded(spark, sf_dir):
    """Lag-0 cross-correlation equals pandas' same-day Pearson of the
    two daily series; every lag's coefficient is in [-1, 1] and pair
    counts shrink by exactly one row per lag step."""
    rows = {r.lag: r for r in QUERIES["events_lead_lag_xcorr"](spark, sf_dir).collect()}
    assert set(rows) == {0, 1, 2, 3}
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
        )
        .toPandas()
        .sort_values("day")
    )
    import numpy as np

    r0 = rows[0]
    assert r0.n == len(daily)
    want = np.corrcoef(daily.x.astype(float), daily.y.astype(float))[0, 1]
    assert abs(r0.xcorr - want) < 1e-9
    for lag in range(4):
        assert -1.0 <= rows[lag].xcorr <= 1.0
        assert rows[lag].n == len(daily) - lag


def test_fano_conservation_and_poisson_scale(spark, sf_dir):
    """Per-type totals conserve the event count; the Fano recompute
    from the reported integer moments matches; active minutes never
    exceed the 43200-minute grid."""
    rows = QUERIES["events_burstiness_fano"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.s1 for r in rows) == ev.count()
    for r in rows:
        assert 0 < r.active_minutes <= 43200
        assert r.s2 >= r.s1  # sum of c^2 >= sum of c for positive counts
        assert r.fano_micro == 1000000 * (43200 * r.s2 - r.s1 * r.s1) // (43200 * r.s1)


def test_eoq_formula_and_monotonicity(spark, sf_dir):
    """EOQ recomputes from demand exactly and is monotone in demand;
    the reorder point is the lead-time share of total demand."""
    rows = sorted(
        QUERIES["orders_eoq_reorder_policy"](spark, sf_dir).collect(),
        key=lambda r: r.demand_qty,
    )
    assert rows
    for r in rows:
        assert r.demand_qty >= 100
        assert r.eoq == math.sqrt((2.0 * float(r.demand_qty) * 50.0) / 3.0)
        assert r.reorder_point == r.demand_qty * 7 // 2405
    eoqs = [r.eoq for r in rows]
    assert eoqs == sorted(eoqs)


def test_ulcer_rms_recompute_from_ledger(spark, sf_dir):
    """Ulcer index recomputed in plain Python from the signed-flow
    ledger (bankroll + running peak) matches every account row."""
    rows = {r.user_id: r for r in QUERIES["win_ulcer_index"](spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    ledger = {}
    for e in sorted(ev, key=lambda e: (e.user_id, e.ts, e.event_id)):
        c = int(math.floor(e.value * 100 + 0.5))
        ledger.setdefault(e.user_id, []).append(c if e.event_type == "purchase" else -c)
    for uid, flows in ledger.items():
        eq, peak, n, s2, mx = 1000000, None, 0, 0, 0
        for f in flows:
            eq += f
            peak = eq if peak is None or eq > peak else peak
            dd = (peak - eq) * 10000 // peak
            n += 1
            s2 += dd * dd
            mx = max(mx, dd)
        r = rows[uid]
        assert (r.n_points, r.sum_dd2, r.max_dd_bps) == (n, s2, mx)
        assert r.ulcer_bps == math.sqrt(s2 / n)


def test_markov_entropy_bounds_and_uniform_limit(spark, sf_dir):
    """Conditional entropy is non-negative and bounded by ln(n_dst)
    (uniform limit), and out-transition totals conserve the LEAD
    pair count."""
    rows = QUERIES["events_markov_entropy"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_out for r in rows) == ev.count() - n_users
    for r in rows:
        assert r.h_cond_nano >= 0
        # nano-floored terms can only undershoot the true entropy
        assert r.h_cond_nano <= int(1e9 * math.log(r.n_dst)) + r.n_dst
        assert 1 <= r.n_dst <= 5


def test_ablation_grid_partitions_corpus(spark, sf_dir):
    """The 2^3 grid partitions the corpus exactly: doc counts and
    char budgets conserve, every share recomputes, and the flag
    combinations are distinct."""
    rows = QUERIES["pipeline_filter_ablation_grid"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.count()
    assert sum(r.n_docs for r in rows) == tot
    assert sum(r.total_chars for r in rows) == docs.select(F.sum("n_chars")).collect()[0][0]
    combos = {(r.pass_len, r.pass_words, r.pass_lang) for r in rows}
    assert len(combos) == len(rows) <= 8
    for r in rows:
        assert r.share_bps == r.n_docs * 10000 // tot


def test_obv_recompute_and_conservation(spark, sf_dir):
    """OBV recomputed in plain Python from daily (vol, close) bars
    matches every row; per-type volumes conserve the event count."""
    rows = sorted(
        QUERIES["win_obv_accumulation"](spark, sf_dir).collect(),
        key=lambda r: (r.event_type, r.day),
    )
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.vol for r in rows) == ev.count()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        obv, prev = 0, None
        for r in rs:
            if prev is not None:
                obv += r.vol if r.close_c > prev else (-r.vol if r.close_c < prev else 0)
            prev = r.close_c
            assert r.obv == obv


def test_raw_scan_restates_tombstone_merge(spark, sf_dir):
    """raw=false reconstruction (drop markers and masked cells)
    reproduces tombstone_merge exactly; markers are never masked."""
    raw = QUERIES["scan_raw_with_tombstones"](spark, sf_dir).collect()
    merged = {r.event_id for r in QUERIES["tombstone_merge"](spark, sf_dir).collect()}
    visible = {r.event_id for r in raw if not r.is_marker and not r.masked}
    assert visible == merged
    assert all(not r.masked for r in raw if r.is_marker)
    assert len(raw) == load_table(spark, sf_dir, "events").count()


def test_ols_slope_matches_numpy_polyfit(spark, sf_dir):
    """Per-brand OLS slope equals numpy's least-squares slope on the
    raw (discount_bps, qty) points to float tolerance."""
    import numpy as np

    rows = QUERIES["orders_discount_elasticity_ols"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.floor(F.col("l_discount") * 10000 + 0.5).cast("long").alias("x"),
            F.floor(F.col("l_quantity") + 0.5).cast("long").alias("y"),
        )
        .toPandas()
    )
    assert len(rows) == pts.p_brand.nunique()
    for r in rows[:5]:
        g = pts[pts.p_brand == r.p_brand]
        slope = np.polyfit(g.x.astype(float), g.y.astype(float), 1)[0]
        assert abs(r.slope_qty_per_bps - slope) < 1e-6


def test_cv2_poisson_neighborhood_and_recompute(spark, sf_dir):
    """CV² recomputes from the reported integer moments; for the
    fixture's near-Poisson per-user streams the population CV² sits
    in a sane (0, 10) band."""
    rows = QUERIES["events_interarrival_cv2"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = (r.n_gaps * r.s2 - r.s1 * r.s1) / (r.s1 * r.s1)
        assert r.cv2 == want
        assert 0.0 <= r.cv2 < 10.0


def test_hits_normalization_and_top_contract(spark, sf_dir):
    """Every HITS score is in (0, 2^20]; at least one authority and
    one hub hit the normalization ceiling exactly; rows arrive in
    the deterministic (score desc, kind, key) order."""
    rows = QUERIES["graph_hits_bipartite"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(0 < r.score_units <= 1048576 for r in rows)
    assert rows[0].score_units == 1048576
    keys = [(-r.score_units, r.node_kind, r.node_key) for r in rows]
    assert keys == sorted(keys)


def test_jsd_bounds_and_identical_distribution_zero(spark, sf_dir):
    """JS divergence is within [−vocab nano-ulps, ln2·1e9] per
    source, vocab accounting is consistent, and token totals
    conserve the corpus."""
    rows = QUERIES["text_js_divergence_vs_corpus"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(F.size(F.expr("filter(split(lower(text), ' '), w -> w <> '')")))
    ).collect()[0][0]
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert r.vocab_used <= r.vocab_total
        # JSD in nats is bounded by ln 2; nano-floored terms can dip
        # at most one ulp per grid cell below 0
        assert -r.vocab_total <= r.jsd_nano <= int(1e9 * math.log(2)) + 1


def test_pvm_bridge_closes_exactly(spark, sf_dir):
    """The three effects close the revenue bridge exactly on every
    brand row, and period totals conserve corpus revenue for brands
    active in both periods."""
    rows = QUERIES["orders_price_volume_mix_bridge"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.delta_c == r.rev_b_c - r.rev_a_c
        assert r.price_eff_c + r.volume_eff_c + r.mix_resid_c == r.delta_c
        assert r.q_a > 0 and r.q_b > 0
        assert r.price_eff_c == (r.q_a * r.rev_b_c) // r.q_b - r.rev_a_c


def test_binseg_split_is_argmin_sse(spark, sf_dir):
    """The reported split minimizes two-segment SSE: recompute every
    candidate split in plain Python for one series and compare."""
    rows = {r.event_type: r for r in QUERIES["events_changepoint_binseg"](spark, sf_dir).collect()}
    et = sorted(rows)[0]
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == et)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("x"))
        .orderBy("day")
        .collect()
    )
    xs = [r.x for r in daily]
    n = len(xs)
    best = None
    for i in range(2, n - 1):
        l, r_ = xs[:i], xs[i:]
        sse = (
            sum(v * v for v in l) - sum(l) ** 2 / len(l)
            + sum(v * v for v in r_) - sum(r_) ** 2 / len(r_)
        )
        if best is None or sse < best[0]:
            best = (sse, i)
    got = rows[et]
    assert got.n_left == best[1]
    assert abs(got.sse_split - best[0]) < 1e-6 * max(1.0, abs(best[0]))
    assert got.split_day == daily[best[1] - 1].day


def test_schema_merge_null_semantics(spark, sf_dir):
    """Foreign-batch columns read as NULL: batch 1 carries n_chars
    only, batch 2 lang only, and row counts partition the corpus."""
    rows = {r.batch: r for r in QUERIES["source_parquet_schema_merge"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    assert rows[1].n_rows + rows[2].n_rows == docs.count()
    assert rows[1].n_chars_present == rows[1].n_rows and rows[1].lang_present == 0
    assert rows[2].lang_present == rows[2].n_rows and rows[2].n_chars_present == 0
    assert rows[2].total_chars is None


def test_clustering_factor_orders_layouts(spark, sf_dir):
    """The custkey-sorted layout touches at most as many files per
    bucket as the date-linear layout (it is the clustered one), and
    both layouts see every bucket."""
    rows = {r.layout: r for r in QUERIES["layout_clustering_factor_audit"](spark, sf_dir).collect()}
    assert set(rows) == {"date_linear", "custkey_sorted"}
    a, b = rows["custkey_sorted"], rows["date_linear"]
    assert a.n_buckets == b.n_buckets
    assert a.file_bucket_pairs <= b.file_bucket_pairs
    o = load_table(spark, sf_dir, "orders")
    n_files = -(-o.count() // 1000)
    # clustered layout: each bucket spans a contiguous rank range
    assert a.file_bucket_pairs <= n_files + a.n_buckets


def test_heaps_fit_matches_recompute(spark, sf_dir):
    """Beta and ln K recompute from the reported integer moments
    using the query's own double semantics (each moment cast to
    binary64 BEFORE the products — they exceed 2^53, so exact-int
    recompute would diverge by design)."""
    r = QUERIES["text_heaps_law_fit"](spark, sf_dir).collect()[0]
    n, sx, sy, sxy, sx2 = (
        float(r.n_sources), float(r.sx), float(r.sy), float(r.sxy), float(r.sx2)
    )
    beta = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    assert r.beta == beta
    # fixture vocab saturates (tiny closed vocabulary), so the
    # exponent sits near 0; real corpora land in 0.4-0.6
    assert 0.0 <= r.beta < 1.5
    assert r.ln_k_micro == math.floor(1e6 * ((sy - beta * sx) / n) / 1e6)


def test_cluster_histogram_known_sizes(spark, sf_dir):
    """The synthesized variant corpus yields exactly the designed
    cluster sizes (3 for first-50 docs, 2 for docs 50-99, singletons
    elsewhere) and doc counts conserve."""
    rows = {r.cluster_size: r for r in QUERIES["dedup_cluster_size_histogram"](spark, sf_dir).collect()}
    docs_n = load_table(spark, sf_dir, "documents").count()
    total = docs_n + 100 + 50
    assert rows[3].n_clusters == 50 and rows[2].n_clusters == 50
    assert rows[1].n_clusters == docs_n - 100
    assert sum(r.n_docs for r in rows.values()) == total
    for r in rows.values():
        assert r.corpus_share_bps == r.n_docs * 10000 // total


def test_autoscale_hold_dominates_and_ceil(spark, sf_dir):
    """servers_held >= servers_now everywhere (hysteresis only adds),
    the ceiling division recomputes, and the hold equals the trailing
    3-hour max recomputed in plain Python."""
    rows = sorted(
        QUERIES["layout_autoscale_plan"](spark, sf_dir).collect(),
        key=lambda r: r.hour_id,
    )
    assert rows
    hist = []
    for r in rows:
        assert r.servers_now == -(-r.reqs // 50)
        hist.append(r.servers_now)
        assert r.servers_held == max(hist[-3:])
        assert r.hysteresis_extra == r.servers_held - r.servers_now


def test_partition_pruning_files_equal_days(spark, sf_dir):
    """The physical proof: distinct files opened == days selected,
    and both are fewer than the days written."""
    r = QUERIES["sink_partition_pruning_audit"](spark, sf_dir).collect()[0]
    assert r.n_files_read == r.n_days_read == 6
    assert r.n_days_total > r.n_days_read
    ev = load_table(spark, sf_dir, "events")
    want = ev.filter(
        (F.to_date("ts") >= F.lit("2024-01-10").cast("date"))
        & (F.to_date("ts") < F.lit("2024-01-16").cast("date"))
    ).count()
    assert r.n_rows == want


def test_row_mutations_conservation(spark, sf_dir):
    """Mutations conserve the event count; collisions = mutations −
    batch-qualifier slots; bps recomputes."""
    rows = QUERIES["cells_row_mutations_batch_audit"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.n_mutations for r in rows) == ev.count()
    for r in rows:
        assert r.n_collisions == r.n_mutations - r.n_batches
        assert r.collision_bps == r.n_collisions * 10000 // r.n_mutations


def test_mattr_window_recompute(spark, sf_dir):
    """MATTR recomputed in plain Python over the same token stream
    matches rows and exclusions: short docs absent, ratios in
    (0, 1e6]."""
    rows = {r.doc_id: r for r in QUERIES["text_mattr_diversity"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for d in docs[:50]:
        toks = [w for w in d.text.lower().split(" ") if w]
        if len(toks) < 25:
            assert d.doc_id not in rows
            continue
        sums = sum(len(set(toks[i : i + 25])) for i in range(len(toks) - 24))
        r = rows[d.doc_id]
        assert (r.n_tok, r.n_windows, r.sum_distinct) == (
            len(toks), len(toks) - 24, sums,
        )
        assert r.mattr_micro == sums * 1000000 // (25 * (len(toks) - 24))
        assert 0 < r.mattr_micro <= 1000000


def test_weighted_median_definition(spark, sf_dir):
    """The reported value is the lower weighted median: cumulative
    weight below it is < half the total, at-or-below reaches half —
    recomputed in plain Python."""
    rows = {r.l_returnflag: r for r in QUERIES["agg_weighted_median"](spark, sf_dir).collect()}
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
        .collect()
    )
    groups = {}
    for x in li:
        c = int(math.floor(x.l_extendedprice * 100 + 0.5))
        w = int(math.floor(x.l_quantity + 0.5))
        groups.setdefault(x.l_returnflag, []).append((c, x.l_orderkey, x.l_linenumber, w))
    for flag, pts in groups.items():
        pts.sort()
        tot = sum(w for *_, w in pts)
        cum = 0
        for c, _, _, w in pts:
            cum += w
            if 2 * cum >= tot:
                assert rows[flag].wmedian_cents == c
                assert rows[flag].total_weight == tot
                break


def test_ljung_box_matches_statsmodels_formula(spark, sf_dir):
    """r_k and Q recompute from the raw daily dollar series in plain
    Python (textbook sample-ACF formulas) to float tolerance; Q is
    non-negative."""
    rows = {r.event_type: r for r in QUERIES["events_ljung_box_q"](spark, sf_dir).collect()}
    et = sorted(rows)[0]
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == et)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) div 100"
                " AS BIGINT)"
            ).alias("x")
        )
        .orderBy("day")
        .collect()
    )
    xs = [r.x for r in daily]
    n = len(xs)
    mu = sum(xs) / n
    den = sum((v - mu) ** 2 for v in xs)
    got = rows[et]
    q = 0.0
    for k, rk_got in ((1, got.r1), (2, got.r2), (3, got.r3)):
        rk = sum((xs[t] - mu) * (xs[t + k] - mu) for t in range(n - k)) / den
        assert abs(rk_got - rk) < 1e-9
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert abs(got.q_stat - q) < 1e-6
    assert got.q_stat >= 0.0


def test_random_walk_edges_exist_and_hash_rule(spark, sf_dir):
    """Every hop follows a real edge, and hop 1 is recomputed in
    plain Python from the hash rule for every walker."""
    rows = QUERIES["graph_random_walk_deterministic"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    pairs = {
        (r.l_suppkey, r.l_partkey)
        for r in li.select("l_suppkey", "l_partkey").distinct().collect()
    }
    adj = {}
    for s, p in pairs:
        adj.setdefault(s * 2 + 1, set()).add(p * 2)
        adj.setdefault(p * 2, set()).add(s * 2 + 1)
    assert len(rows) == len({s for s, _ in pairs})
    for r in rows:
        assert r.hop1 in adj[r.start_node]
        assert r.hop2 in adj[r.hop1]
        assert r.hop3 in adj[r.hop2]
        want = min(
            adj[r.start_node],
            key=lambda d: (((r.start_node * 31 + d) * 2654435761 + 97) % 2147483647, d),
        )
        assert r.hop1 == want


def test_block_index_bisect_contract(spark, sf_dir):
    """The resolved block's first key is <= the probe, the probe's
    region matches, and no later block in the region also satisfies
    first_key <= probe."""
    rows = QUERIES["layout_block_index_lookup"](spark, sf_dir).collect()
    assert rows
    plan = {
        (r.region, r.hfile): (r.first_key, r.last_key)
        for r in QUERIES["cells_bulkload_hfile_plan"](spark, sf_dir).collect()
    }
    for r in rows:
        assert r.region == r.probe // 16
        assert r.block_first_key <= r.probe
        assert r.n_candidate_blocks >= 1


def test_systematic_sample_exact_fractions(spark, sf_dir):
    """Sample size is exactly the count of ranks ≡ 7 (mod 20), and
    the error column recomputes from the reported integers."""
    r = QUERIES["sample_systematic_kth"](spark, sf_dir).collect()[0]
    want_n = sum(1 for i in range(1, r.n_total + 1) if i % 20 == 7)
    assert r.n_sampled == want_n
    assert r.scaled_estimate_c == r.sampled_rev_c * 20
    assert r.estimate_error_bps == abs(r.scaled_estimate_c - r.total_rev_c) * 10000 // r.total_rev_c
    assert r.estimate_error_bps < 1000  # a 5% systematic sample lands within 10%


def test_seasonal_decompose_identity_and_bounds(spark, sf_dir):
    """x = trend + seasonal + residual + bounded division remainders;
    seasonal components per series sum to ~0 (mean-centering)."""
    rows = QUERIES["events_seasonal_decompose"](spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        # identity holds exactly as stated: resid = (x - trend) - seasonal
        assert r.resid_c == (r.x - r.trend_c) - r.seasonal_c
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        dows = {}
        for r in rs:
            dows.setdefault(r.seasonal_c, 0)
        # 7 distinct weekday components at most
        assert len({r.seasonal_c for r in rs}) <= 7


def test_metric_audit_weighting_direction(spark, sf_dir):
    """Both definitions recompute from per-user data, and the gap
    column is exactly their difference."""
    rows = {r.cohort: r for r in QUERIES["events_metric_definition_audit"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
        )
        .collect()
    )
    agg = {}
    for u in pu:
        c = u.user_id % 4
        a = agg.setdefault(c, [0, 0, 0, 0])  # users, events, purch, sum_rate
        a[0] += 1
        a[1] += u.n
        a[2] += u.p
        a[3] += u.p * 1000000 // u.n
    for c, (nu, te, tp, sr) in agg.items():
        r = rows[c]
        assert (r.n_users, r.tot_events, r.tot_purch) == (nu, te, tp)
        assert r.ratio_of_sums_micro == tp * 1000000 // te
        assert r.avg_of_ratios_micro == sr // nu
        assert r.gap_micro == r.ratio_of_sums_micro - r.avg_of_ratios_micro


def test_pmi_support_floor_and_recompute(spark, sf_dir):
    """Every reported bigram meets the support floor; PMI recomputes
    from the reported counts; ordering is (score desc, bigram)."""
    rows = QUERIES["text_collocation_pmi"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    n_uni = n_bi = 0
    for d in docs:
        toks = [w for w in d.text.lower().split(" ") if w]
        n_uni += len(toks)
        n_bi += max(0, len(toks) - 1)
    keys = []
    for r in rows:
        assert r.c_xy >= 5
        want = math.floor(
            1e9 * math.log((r.c_xy * (float(n_uni) * float(n_uni)))
                           / (float(n_bi) * (float(r.c_x) * float(r.c_y))))
        )
        assert r.pmi_nano == want
        keys.append((-r.pmi_nano, r.bigram))
    assert keys == sorted(keys)
