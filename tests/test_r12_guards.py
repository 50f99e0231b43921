"""r12 guards (VERDICT r11 item 2): min-label propagation must reach
its fixed point or fail loudly — never silently return under-merged
clusters past the round ceiling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_support_spark.operators.llm import _propagate_min_labels


def _graph(spark, undirected_pairs):
    pairs = spark.createDataFrame(undirected_pairs, "doc_a bigint, doc_b bigint")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).distinct()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    return labels, edges


def test_deep_chain_raises_past_ceiling(spark):
    """A 40-node path graph needs ~39 propagation rounds; the 16-round
    ceiling must raise (the chain-of-edits family), not return
    under-merged labels."""
    labels, edges = _graph(spark, [(i, i + 1) for i in range(39)])
    with pytest.raises(ValueError, match="did not reach a fixed point"):
        _propagate_min_labels(labels, edges, max_rounds=16)


def test_deep_chain_converges_with_raised_ceiling(spark):
    """The same chain converges (every node labeled 0) once the
    ceiling covers its diameter — the documented escape hatch."""
    labels, edges = _graph(spark, [(i, i + 1) for i in range(20)])
    out = _propagate_min_labels(labels, edges, max_rounds=64)
    got = {r.doc_id: r.label for r in out.collect()}
    assert got == {i: 0 for i in range(21)}


def test_cliques_converge_fast_and_exactly(spark):
    """Near-clique components (the real near-dup shape) converge
    within the default ceiling and each member gets the component
    minimum."""
    clique_a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    clique_b = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    labels, edges = _graph(spark, clique_a + clique_b)
    out = _propagate_min_labels(labels, edges, max_rounds=16)
    got = {r.doc_id: r.label for r in out.collect()}
    assert got == {**{i: 0 for i in range(5)}, **{i: 10 for i in range(10, 14)}}


def test_lang_source_block_cap_raises_on_hot_block(spark):
    """The (lang, source) block guard must trip on a hot block with
    the calling kernel's name in the message (r12: applied to every
    blocked-exact pair kernel, not just the Jaccard twins)."""
    from hbase_support_spark.operators.llm import _assert_blocks_bounded

    d = spark.range(50).select(
        F.lit("en").alias("lang"), F.lit("web").alias("source")
    )
    with pytest.raises(ValueError, match="dedup_containment: largest"):
        _assert_blocks_bounded(d, cap=10, name="dedup_containment")
    _assert_blocks_bounded(d, cap=50, name="dedup_containment")  # at cap: fine


def test_env_skip_probes_track_their_dependencies():
    """The suite's three skips are environment gates (VERDICT r11 item
    7: 'skip count <= 3 with reasons asserted'). Pin each gate's probe
    to its actual dependency so the skips LIFT THEMSELVES on an image
    that ships the dep — a probe that hardcodes False would silently
    keep real coverage off forever."""
    def _imports(*mods):
        try:
            for m in mods:
                __import__(m)
            return True
        except ImportError:
            return False

    from hbase_support_spark.streaming.demo import transform_with_state_available

    # transformWithStateInPandas demo <-> google.protobuf
    assert transform_with_state_available() == _imports("google.protobuf")

    # Connect smoke <-> grpc + protobuf
    import sys
    sys.path.insert(0, "tests")
    try:
        from test_connect_smoke import _has_connect
    finally:
        sys.path.remove("tests")
    assert _has_connect() == _imports("grpc", "google.protobuf")

    # ieee-knob sweep <-> duckdb exposing ieee_floating_point_ops
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("SET ieee_floating_point_ops = false")
        knob = True
    except Exception:
        knob = False
    finally:
        con.close()
    from test_ieee_semantics import _knob_supported  # noqa: E402  (same sys.path dance)

    assert _knob_supported() == knob


def test_pin_is_a_leaf_and_stores_disk_only(spark):
    """io.pin's two contracts (SCALE.md r12): checkpoint LEAF
    semantics (self-derived joins must resolve — the persist()
    variant broke agg_weighted_median with ambiguous attributes) and
    DISK_ONLY storage (pinned data-scale frames must not sit
    deserialized on the heap)."""
    from hbase_support_spark.io import pin

    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    p = pin(df)
    agg = p.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    assert p.join(agg, "v").count() == 1000  # self-derived join resolves

    jsc = spark.sparkContext._jsc.sc()
    levels = [
        (i.storageLevel().useDisk(), i.storageLevel().useMemory())
        for i in jsc.getRDDStorageInfo()
    ]
    assert (True, False) in levels, levels  # disk yes, on-heap rows no
