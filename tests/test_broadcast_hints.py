"""r10 broadcast-hint audit — pinned regressions.

`F.broadcast()` is a FORCE hint: it overrides the autoBroadcast
threshold and AQE's size logic, so hinting a frame that GROWS with
the data (degree tables, vocab document frequencies, shingle sets,
fingerprint buckets, daily-active cohorts) is a guaranteed driver
OOM at some scale while passing at every test SF. Seven such sites
were unhinted in r10; each join co-partitions with the aggregation
that built the frame, and AQE still broadcasts when the runtime size
is small (verified at x128: executed plan keeps BroadcastHashJoin,
timings flat — SCALE.md r10 broadcast-hint audit).

These pins assert the unbounded frames stay unhinted. Bounded frames
(1-row totals, top-K vocab, centroids, lexicons, nation dims) keep
their hints on purpose and are not swept here — a full-allowlist
sweep over all ~190 hint sites would pin mostly-safe noise.
"""

from __future__ import annotations

import inspect

import pytest

from hbase_support_spark import QUERIES, load_all

load_all()  # no spark-fixture test in this module triggers it otherwise

# query -> source fragments that must (not) appear
_UNHINTED = {
    "graph_degree_assortativity": ["edges.join(ds,", ".join(dc,"],
    "basket_copurchase_lift": ["pair_cnt.join(ca,", ".join(cb,"],
    "text_tfidf_topterms": ['tf.join(df, "w")'],
    "text_ngram_lm_perplexity": ['toks.join(freq, "w")'],
    "text_boilerplate_density": ['s.join(bp, "shingle", "left")'],
    # r12: upgraded from merely-unhinted to an explicit merge hint —
    # AQE measured ok_fps under the broadcast threshold at the x128
    # bounded census and the deserialized build OOMed the driver; a
    # corpus-growing frame must be pinned OFF the broadcast path,
    # not left to a size heuristic (SCALE.md r12).
    # r12: the pair stage became an in-bucket expansion (sorted
    # collect_list over count-first-admitted fingerprints); the one
    # remaining corpus-scale join is the merge-hinted admission
    # semi-join — still never broadcast.
    "dedup_winnow_pairs": ['picks.join(ok_fps.hint("merge"), "fp", "left_semi")'],
    "events_retention_daily": ['.join(cohort, "user_id")'],
    "tombstone_merge": ["puts.join(dels,"],
    "cells_major_compaction_view": ["live.join(dels,"],
    "scan_raw_with_tombstones": ["ev.join(markers,"],
    "layout_block_index_lookup": ["probes.join(\n        idx,"],
}

_FORBIDDEN = {
    "graph_degree_assortativity": ["F.broadcast(ds)", "F.broadcast(dc)"],
    "basket_copurchase_lift": ["F.broadcast(ca)", "F.broadcast(cb)"],
    "text_tfidf_topterms": ["F.broadcast(df)"],
    "text_ngram_lm_perplexity": ["F.broadcast(freq)"],
    "text_boilerplate_density": ["F.broadcast(bp)"],
    "dedup_winnow_pairs": ["F.broadcast(ok_fps)"],
    "events_retention_daily": ["F.broadcast(cohort)"],
    "tombstone_merge": ["F.broadcast(dels)"],
    "cells_major_compaction_view": ["F.broadcast(dels)"],
    "scan_raw_with_tombstones": ["F.broadcast(markers)"],
    "layout_block_index_lookup": ["F.broadcast(idx)"],
    "join_shipping_priority_topk": ["F.broadcast(c)"],
    # ---- r11 sweep (empirical two-scale measurement, HINT_AUDIT_r11):
    # TPC-H part/supplier grow linearly with SF (part = SF x 200k,
    # supplier = SF x 10k — ~2e10 / 1e9 rows at 100 TB); force-hints
    # on them were guaranteed driver OOMs. AQE still broadcasts at
    # small SF (plans verified unchanged at sf0.1).
    "tpch_q2_min_cost_supplier": ["F.broadcast(p)", "F.broadcast(s)"],
    "tpch_q7_volume": ["F.broadcast(s)"],
    "tpch_q8_share": ["F.broadcast(p)", "F.broadcast(s)"],
    "tpch_q9_product_profit": ["F.broadcast(p)", "F.broadcast(s)"],
    "tpch_q14_promo": ["F.broadcast(p)"],
    "tpch_q15_top_supplier": ["F.broadcast(s)"],
    "tpch_q16_supplier_counts": ["F.broadcast(p)", "F.broadcast(bad)"],
    "tpch_q17_scalar_corr": ["F.broadcast(p)"],
    "tpch_q19_bracket_revenue": ["F.broadcast(p)"],
    "tpch_q20_excess_suppliers": ["F.broadcast(p)"],
    "tpch_q21_waiting_supplier": ["F.broadcast(s)"],
    "orders_discount_elasticity_ols": ["F.broadcast(p)"],
    "orders_price_volume_mix_bridge": ["F.broadcast(p)"],
    # corpus-vocabulary frames (Heaps' law growth):
    "text_collocation_pmi": ["F.broadcast(u1)", "F.broadcast(u2)"],
    "text_js_divergence_vs_corpus": ["F.broadcast(cw)"],
    "dedup_bloom_prefilter_audit": ["F.broadcast(a_hashes"],
}


@pytest.mark.parametrize("name", sorted(set(_UNHINTED) | set(_FORBIDDEN)))
def test_unbounded_frame_stays_unhinted(name):
    src = inspect.getsource(QUERIES[name])
    for frag in _UNHINTED.get(name, ()):
        assert frag in src, (
            f"{name}: expected unhinted join fragment {frag!r} — if the "
            "join was restructured, update this pin AND re-verify the "
            "frame is not force-broadcast (SCALE.md r10 broadcast-hint "
            "audit)"
        )
    for frag in _FORBIDDEN[name]:
        assert frag not in src, (
            f"{name}: {frag!r} force-broadcasts a frame that grows with "
            "the data — driver OOM at scale; see SCALE.md r10 "
            "broadcast-hint audit"
        )


# r11: data-scale frames inside SOURCE-module helpers (not query fns)
_MODULE_FORBIDDEN = {
    "hbase_support_spark.sources.txlog": ["F.broadcast(keys)"],
    "hbase_support_spark.sources.indexes": ["F.broadcast(keys)"],
}


@pytest.mark.parametrize("mod", sorted(_MODULE_FORBIDDEN))
def test_helper_modules_keep_key_frames_unhinted(mod):
    """Merge-source key sets and index update batches grow with the
    WORKLOAD (a 100-TB table's daily merge batch is itself huge);
    left to AQE, which broadcasts them only when actually small."""
    import importlib

    src = inspect.getsource(importlib.import_module(mod))
    for frag in _MODULE_FORBIDDEN[mod]:
        assert frag not in src, f"{mod}: {frag!r} re-hinted a workload-scale frame"


# r11: count-first bucket guards. The LSH band-bucket kernels must
# admit a bucket via a COUNT aggregate + semi-join BEFORE collecting
# member structs — the post-collect spelling materialized a
# mass-duplicate bucket's entire membership (shingle arrays in
# minhash) into one agg buffer, observed as a >50 GB spill and a
# disk-full task death at the x128 census. Order is asserted in
# source: the semi-join precedes the collect_list.
_COUNT_FIRST = {
    "dedup_near_minhash": "minhash_pairs",
    "dedup_simhash": None,
    "multimodal_phash_near_dup": None,
}


@pytest.mark.parametrize("name", sorted(_COUNT_FIRST))
def test_bucket_guard_counts_before_collecting(name):
    from hbase_support_spark.operators import llm

    target = _COUNT_FIRST[name]
    fn = getattr(llm, target) if target else QUERIES[name]
    src = inspect.getsource(fn)
    assert '"left_semi"' in src, f"{name}: count-first semi-join guard missing"
    semi = src.index('"left_semi"')
    collect = min(
        i for i in (
            src.find("F.collect_list(F.struct("),
            src.find('F.collect_list("doc_id")'),
        ) if i >= 0
    )
    assert semi < collect, (
        f"{name}: collect_list runs before the bucket-count guard — "
        "a hot bucket materializes its whole membership again"
    )
