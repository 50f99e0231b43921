"""Invariant tests for the round-6 operators (SURVEY.md §5.3):
cross-checks against independent formulations — pandas/numpy
recomputation, conservation laws, result-identity to naive forms.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.io import load_table

load_all()


def _toks(text: str) -> list[str]:
    return [w for w in text.lower().split(" ") if w != ""]


def test_bpe_merge_candidates_match_pandas(spark, sf_dir):
    """Top-20 adjacent-pair counts recomputed with a plain Python
    Counter must agree exactly (count AND ordering tie-break)."""
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    c: Counter = Counter()
    for r in docs:
        t = _toks(r.text)
        for a, b in zip(t, t[1:]):
            c[f"{a} {b}"] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.pair, r.cnt)
        for r in QUERIES["text_bpe_merge_candidates"](spark, sf_dir)
        .orderBy("rnk")
        .collect()
    ]
    assert got == expect


def test_bpe_apply_merge_conservation(spark, sf_dir):
    """Each merge fuses exactly two tokens into one, so
    n_toks_before - n_toks_after == n_merges row-wise, and the total
    merges across docs equals the winner's greedy non-overlapping
    occurrence count recomputed in Python."""
    rows = QUERIES["text_bpe_apply_merge"](spark, sf_dir).collect()
    assert rows, "fixture must contain the winning pair somewhere"
    pair = rows[0].merged_pair
    for r in rows:
        assert r.n_toks_before - r.n_toks_after == r.n_merges > 0
        assert r.merged_pair == pair
    w1, w2 = pair.split(" ")
    total = 0
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        t = _toks(r.text)
        i = 0
        while i < len(t) - 1:
            if t[i] == w1 and t[i + 1] == w2:
                total += 1
                i += 2
            else:
                i += 1
    assert total == sum(r.n_merges for r in rows)


def test_novelty_rate_first_doc_is_fully_novel(spark, sf_dir):
    """The earliest doc with shingles is 100% novel by construction,
    and every doc's novel count is bounded by its shingle count;
    global sum(n_novel) == |distinct shingles in corpus|."""
    df = QUERIES["text_ngram_novelty_rate"](spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in df}
    first = by_id[min(by_id)]
    assert first.n_novel == first.n_shingles and first.novelty_rate == 1.0
    assert all(0 <= r.n_novel <= r.n_shingles for r in df)
    distinct = set()
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        t = _toks(r.text)
        distinct.update(
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        )
    assert sum(r.n_novel for r in df) == len(distinct)


def test_length_bucket_and_curriculum_conserve_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    n_docs = sum(1 for r in docs if _toks(r.text))
    lb = QUERIES["pipeline_length_bucket_batching"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in lb) == n_docs
    for r in lb:
        assert r.padded_tokens == r.n_docs * r.bucket >= r.real_tokens
    cur = QUERIES["pipeline_curriculum_order"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in cur) == n_docs
    assert sorted(r.stage for r in cur) == [1, 2, 3, 4]
    # stages are contiguous difficulty ranges
    s = sorted(cur, key=lambda r: r.stage)
    for a, b in zip(s, s[1:]):
        assert a.max_avg_len_x100 <= b.min_avg_len_x100


def test_ewma_dyadic_matches_numpy(spark, sf_dir):
    """Recompute the 8-tap dyadic EWMA for every user in numpy (same
    left-to-right order) — must agree to the bit."""
    got = (
        QUERIES["win_ewma_dyadic"](spark, sf_dir)
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    by_user: dict = {}
    expect = []
    for r in ev:
        hist = by_user.setdefault(r.user_id, [])
        hist.append(r.value)
        num = 0.0
        den = 0.0
        for k in range(8):
            w = 2.0 ** -(k + 1)
            if k < len(hist):
                num = num + hist[-1 - k] * w
                den = den + w
            else:
                num = num + 0.0 * w
                den = den + 0.0
        expect.append(num / den)
    assert len(got) == len(expect)
    for r, e in zip(got, expect):
        assert r.ewma8 == e  # bit-identical, not approx


def test_anova_f_matches_numpy(spark, sf_dir):
    row = QUERIES["events_anova_f_oneway"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    groups: dict = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(
            math.floor(r.value * 100 + 0.5)
        )
    k = len(groups)
    allv = [v for g in groups.values() for v in g]
    n = len(allv)
    grand = sum(allv) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups.values())
    ssw = sum((v - sum(g) / len(g)) ** 2 for g in groups.values() for v in g)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.k == k and row.n == n
    assert abs(row.f_stat - f) < 1e-4
    assert abs(row.ssb_c2 - ssb) / ssb < 1e-9
    assert abs(row.ssw_c2 - ssw) / ssw < 1e-9


def test_sprt_decision_boundaries(spark, sf_dir):
    """LLR recomputed from cumulative integer counts; decisions obey
    the inlined Wald boundaries."""
    from hbase_support_spark.operators.aggregates import (
        _SPRT_A,
        _SPRT_B,
        _SPRT_C1,
        _SPRT_C2,
    )

    rows = QUERIES["events_sprt_sequential_test"](spark, sf_dir).orderBy("day").collect()
    prev_n = 0
    for r in rows:
        assert r.n_cum > prev_n
        prev_n = r.n_cum
        llr = r.k_cum * _SPRT_C1 + (r.n_cum - r.k_cum) * _SPRT_C2
        assert r.llr == llr
        if llr >= _SPRT_A:
            assert r.decision == "accept_h1"
        elif llr <= _SPRT_B:
            assert r.decision == "accept_h0"
        else:
            assert r.decision == "continue"


def test_srm_counts_conserve_users(spark, sf_dir):
    row = QUERIES["events_srm_check"](spark, sf_dir).collect()[0]
    users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert row.n_a + row.n_b == users
    assert row.chi2 >= 0


def test_binary_quantize_recall_bits(spark, sf_dir):
    """n_match_bits recomputed in numpy for every reported row."""
    e = {
        r.vec_id: np.array(r.embedding, dtype=np.float32)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    qb = np.asarray(e[0], dtype=np.float64) > 0.0
    rows = QUERIES["embedding_binary_quantize_recall"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        bits = np.asarray(e[r.vec_id], dtype=np.float64) > 0.0
        assert r.n_match_bits == int((bits == qb).sum())


def test_kmeans_assign_conserves_vectors(spark, sf_dir):
    rows = QUERIES["sim_kmeans_assign_step"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_assigned for r in rows) == total
    assert all(0 <= r.centroid_id < 8 for r in rows)


def test_t_closeness_matches_pandas(spark, sf_dir):
    """TVD recomputed with pandas for every QI class."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    ).toPandas()
    c["band"] = np.floor(c.c_acctbal / 1000.0).astype("int64")
    n = len(c)
    gshare = c.band.value_counts() / n
    rows = QUERIES["privacy_t_closeness"](spark, sf_dir).collect()
    assert len(rows) == len(c.groupby(["c_nationkey", "c_mktsegment"]))
    for r in rows[:20]:
        grp = c[(c.c_nationkey == r.c_nationkey) & (c.c_mktsegment == r.c_mktsegment)]
        share = grp.band.value_counts() / len(grp)
        tvd = 0.5 * sum(
            abs(share.get(b, 0.0) - gshare.get(b, 0.0))
            for b in set(gshare.index) | set(share.index)
        )
        assert r.k_size == len(grp)
        assert abs(r.t_value - tvd) < 1e-9
        assert r.t_close == (tvd <= 0.2 + 1e-12)


def test_null_key_bypass_equals_naive_join(spark, sf_dir):
    """The optimized split-union must be row-identical to the naive
    left join it replaces."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    f = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("price_cents"),
    )
    naive = (
        f.join(c, f["cust_fk"] == c["c_custkey"], "left")
        .select("o_orderkey", "cust_fk", "c_mktsegment", "price_cents")
        .orderBy("o_orderkey")
        .collect()
    )
    got = (
        QUERIES["join_null_key_bypass"](spark, sf_dir).orderBy("o_orderkey").collect()
    )
    assert got == naive
    # and the fixture genuinely exercises the bypass
    assert any(r.cust_fk is None for r in got)


def test_region_balance_conserves_rows(spark, sf_dir):
    rows = QUERIES["layout_region_balance_plan"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.total_rows for r in rows) == total
    assert sum(r.dev_rows_x8 for r in rows) == 0  # signed deviations cancel
    # recompute the whole draft in pandas: bucket users into the 32
    # fixed-width regions (empty ones produce no row), snake-assign
    # by size desc, compare loads
    ev = load_table(spark, sf_dir, "events").select("user_id").toPandas()
    lo, hi = ev.user_id.min(), ev.user_id.max()
    region = np.minimum((ev.user_id - lo) * 32 // (hi - lo + 1), 31)
    sizes = region.value_counts().sort_index()
    assert sum(r.n_regions for r in rows) == len(sizes)
    assert sorted(r.server_id for r in rows) == list(range(min(8, len(sizes))))
    order = sorted(sizes.index, key=lambda b: (-sizes[b], b))
    loads = {s: 0 for s in range(8)}
    for rn, b in enumerate(order):
        pos = rn % 8
        server = pos if (rn // 8) % 2 == 0 else 7 - pos
        loads[server] += int(sizes[b])
    assert {r.server_id: r.total_rows for r in rows} == loads


def test_csv_malformed_audit_conserves_orders(spark, sf_dir):
    row = QUERIES["source_csv_malformed_audit"](spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    total = o.count()
    bad = o.filter(F.col("o_orderkey") % 97 == 0).count()
    assert row.n_good + row.n_corrupt == total
    assert row.n_corrupt == bad > 0


def test_binaryfile_roundtrip_covers_all_docs(spark, sf_dir):
    got = QUERIES["source_binaryfile_multimodal"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert got.count() == docs.count()
    assert got.filter(F.col("doc_id").isNull()).count() == 0
