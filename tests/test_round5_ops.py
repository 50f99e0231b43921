"""Invariant tests for the round-5 operators (SURVEY.md §5.3):
cross-checks against independent formulations — pandas/numpy
recomputation, conservation laws, stability under recomputation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.io import load_table

load_all()


def test_filter_funnel_conserves_documents(spark, sf_dir):
    """Σ rejections + final survivors == corpus size, and the
    survivor count must equal pipeline_clean_corpus's row count (the
    funnel is the cleaner's own accounting)."""
    rows = {r.stage_idx: r for r in QUERIES["pipeline_filter_funnel_report"](spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "documents").count()
    rejected = sum(r.n_rejected for r in rows.values())
    final_remaining = rows[max(rows)].n_remaining
    assert rejected + final_remaining == total
    # monotone survivors
    rem = [rows[i].n_remaining for i in sorted(rows)]
    assert rem == sorted(rem, reverse=True)
    kept = QUERIES["pipeline_clean_corpus"](spark, sf_dir).count()
    assert final_remaining == kept


def test_train_test_split_partitions_corpus(spark, sf_dir):
    """Splits are a partition (sum == corpus), proportions near
    80/10/10, and re-running yields byte-identical assignment."""
    a = {r.split: r for r in QUERIES["sample_train_test_split"](spark, sf_dir).collect()}
    b = {r.split: r for r in QUERIES["sample_train_test_split"](spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in a.values()) == total
    assert set(a) == {"train", "val", "test"}
    assert abs(a["train"].n_docs / total - 0.8) < 0.1
    for k in a:
        assert (a[k].n_docs, a[k].total_chars) == (b[k].n_docs, b[k].total_chars)


def test_rolling_vwap_and_median_match_pandas(spark, sf_dir):
    """One partition recomputed with pandas must match exactly."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < 100)
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_shipdate",
                "l_extendedprice", "l_quantity")
        .toPandas()
    )
    part = li["l_partkey"].value_counts().idxmax()
    g = li[li.l_partkey == part].sort_values(
        ["l_shipdate", "l_orderkey", "l_linenumber"]
    ).reset_index(drop=True)
    cents = np.floor(g.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64")
    cq = g.l_quantity.to_numpy().cumsum()
    cc = cents.cumsum()
    want_vwap = (np.floor(cc * 10000.0 / cq)).astype("int64") / 1e6

    got = {
        (r.l_orderkey, r.l_linenumber): r.vwap
        for r in QUERIES["win_anchored_vwap"](spark, sf_dir)
        .filter(F.col("l_partkey") == int(part))
        .collect()
    }
    for i in range(len(g)):
        assert got[(g.l_orderkey[i], g.l_linenumber[i])] == want_vwap[i]

    # rolling median twin on the same partition (part < 100 subset)
    got_med = {
        (r.l_orderkey, r.l_linenumber): r.rolling_median
        for r in QUERIES["win_rolling_median_7"](spark, sf_dir)
        .filter(F.col("l_partkey") == int(part))
        .collect()
    }
    for i in range(len(g)):
        lo = max(0, i - 6)
        frame = np.sort(cents[lo : i + 1])
        n = len(frame)
        med = (frame[(n - 1) // 2] + frame[n // 2]) / 2.0 / 100.0
        assert got_med[(g.l_orderkey[i], g.l_linenumber[i])] == med


def test_rolling_zscore_matches_numpy(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < 100)
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
        .toPandas()
    )
    part = li["l_partkey"].value_counts().idxmax()
    g = li[li.l_partkey == part].sort_values(
        ["l_shipdate", "l_orderkey", "l_linenumber"]
    ).reset_index(drop=True)
    cents = np.floor(g.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64")
    got = {
        (r.l_orderkey, r.l_linenumber): r.rolling_z
        for r in QUERIES["win_rolling_zscore"](spark, sf_dir)
        .filter(F.col("l_partkey") == int(part))
        .collect()
    }
    for i in range(len(g)):
        lo = max(0, i - 27)
        w = cents[lo : i + 1]
        n = len(w)
        num = int(n * w[-1] - w.sum())
        den2 = int(n * (w.astype(object) ** 2).sum() - int(w.sum()) ** 2)
        want = None if den2 <= 0 else round(num / np.sqrt(float(den2)), 6) + 0.0
        assert got[(g.l_orderkey[i], g.l_linenumber[i])] == want


def test_phash_finds_its_padded_variants(spark, sf_dir):
    """Every padded variant must pair with its own original at a
    tiny Hamming distance (the op's raison d'etre)."""
    rows = QUERIES["multimodal_phash_near_dup"](spark, sf_dir).collect()
    by_pair = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    n_docs = load_table(spark, sf_dir, "documents").count()
    found = sum(1 for (a, b) in by_pair if b == a + 2000000)
    assert found >= 40  # of the 50 planted variants
    assert all(h <= 8 for h in by_pair.values())
    assert all(a < b for (a, b) in by_pair)
    assert n_docs > 0


def test_centroid_classify_diagonal_dominant(spark, sf_dir):
    """Fixture labels come from coarse clustering, so nearest-centroid
    classification must be better than chance: diagonal mass of the
    confusion matrix > uniform-guess share; counts conserve vectors."""
    rows = QUERIES["sim_centroid_classify"](spark, sf_dir).collect()
    total = sum(r.n for r in rows)
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert total == n_vec
    labels = {r.true_label for r in rows}
    diag = sum(r.n for r in rows if r.true_label == r.pred_label)
    assert diag / total > 1.0 / max(len(labels), 2)


def test_diff_in_diff_identity(spark, sf_dir):
    """did == uplift(arm1) - uplift(arm0), recomputed from the
    emitted cells."""
    rows = {r.arm: r for r in QUERIES["events_diff_in_diff"](spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    want = round(rows[1].uplift - rows[0].uplift, 6) + 0.0
    for r in rows.values():
        assert r.did_estimate == want
        assert r.n_pre > 0 and r.n_post > 0


def test_bfs_hops_sound_and_minimal(spark, sf_dir):
    """Spot-check soundness: every hop-1 node is a direct neighbor of
    the source; hop-2 nodes are not (else min-hop would be 1)."""
    got = {r.part: r.hops for r in QUERIES["graph_bfs_hops"](spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").toPandas()
    src = li.l_partkey.min()
    orders_of = li[li.l_partkey == src].l_orderkey.unique()
    direct = set(li[li.l_orderkey.isin(orders_of)].l_partkey) - {src}
    assert got[src] == 0
    assert {p for p, h in got.items() if h == 1} == direct
    assert all(h >= 2 for p, h in got.items() if p not in direct and p != src)


def test_pca_power_top1_replicates_exactly_and_bounds(spark, sf_dir):
    """Replicate the ENTIRE integer algorithm in pure Python on the
    same data and require bit-identical components — the algorithm
    is deterministic by construction, so any drift is a bug. The
    convergence CLAIM is bounded, not assumed: the Rayleigh share
    must lie between the flat-spectrum floor and numpy's true
    lambda1 share (on these near-isotropic fixtures 8 steps cannot
    isolate the top eigenvector; the ~1/64-flat share is exactly
    the anisotropy diagnostic the op exists to report)."""
    rows = QUERIES["embedding_pca_power_top1"](spark, sf_dir).collect()
    got = {r.dim: r.component for r in rows}
    x = np.stack(
        load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype("float64")
    q = np.floor(x * 4096.0).astype(object)  # python ints: exact
    n = len(q)
    s = q.sum(axis=0)
    m = q.T @ q
    c = {(i, j): n * int(m[i - 1][j - 1]) - int(s[i - 1]) * int(s[j - 1])
         for i in range(1, 65) for j in range(1, 65)}
    p = 1 << max(max(abs(v) for v in c.values()).bit_length() - 30, 0)
    cs = {k: v // p for k, v in c.items()}
    v = {j: 4096 for j in range(1, 65)}
    for _ in range(8):
        mv = {i: sum(cs[(i, j)] * v[j] for j in range(1, 65)) for i in range(1, 65)}
        p2 = 1 << max(max(max(abs(t) for t in mv.values()), 1).bit_length() - 12, 0)
        v = {i: mv[i] // p2 for i in range(1, 65)}
    assert got == v  # bit-identical replication
    w = {i: sum(cs[(i, j)] * v[j] for j in range(1, 65)) for i in range(1, 65)}
    wq = {i: w[i] // 1048576 for i in range(1, 65)}
    num = sum(v[i] * wq[i] for i in range(1, 65))
    den = sum(v[i] * v[i] for i in range(1, 65))
    trace = sum(cs[(i, i)] for i in range(1, 65))
    share = rows[0].explained_share
    assert abs(share - num * 1048576.0 / den / trace) < 1e-6
    cf = np.array([[c[(i, j)] for j in range(1, 65)] for i in range(1, 65)],
                  dtype="float64")
    evals = np.linalg.eigvalsh(cf)
    top_share = evals[-1] / np.trace(cf)
    # Rayleigh quotient of ANY vector is <= lambda1 and the iterate
    # can only improve on the flat floor
    assert 0.5 / 64 < share <= top_share + 1e-6


def test_knn_self_join_twins_raise_on_oversized_block(spark, tmp_path):
    """VERDICT r05 item 2: both sim_knn_self_join twins must refuse an
    oversized label block like every sibling pair kernel — the
    expression twin via the pre-join agg guard, the BLAS twin via the
    cap inlined in its applyInPandas closure (surfaces wrapped in
    Spark's PythonException)."""
    import pyspark.errors
    import pytest

    from hbase_support_spark.operators.llm import VEC_PAIR_BLOCK_CAP

    n = VEC_PAIR_BLOCK_CAP + 1
    big = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(d)) for d in range(4)]).cast("array<float>").alias("embedding"),
        F.lit(7).alias("label"),
    )
    d = str(tmp_path / "sfbig")
    big.write.parquet(f"{d}/embeddings.parquet")

    with pytest.raises(ValueError, match="block has"):
        QUERIES["sim_knn_self_join"](spark, d)

    with pytest.raises(pyspark.errors.PySparkException, match="block has"):
        QUERIES["sim_knn_self_join_blas"](spark, d).collect()
