"""Snapshot isolation and secondary-index semantics
(sources/snapshots.py, sources/indexes.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_support_spark.io import load_table
from hbase_support_spark.sources.indexes import index_build, index_lookup
from hbase_support_spark.sources.snapshots import (
    snapshot_clone,
    snapshot_create,
    snapshot_list,
    snapshot_read,
)


def test_snapshot_is_point_in_time_under_appends(spark, sf_dir, tmp_path):
    """Rows appended to the live table AFTER the snapshot must not
    appear in the snapshot read (the manifest pinned the files)."""
    live = str(tmp_path / "live")
    nation = load_table(spark, sf_dir, "nation")
    n0 = nation.count()
    nation.write.parquet(live)
    manifest = snapshot_create(live, str(tmp_path / "snaps"), "v1")

    nation.limit(5).write.mode("append").parquet(live)
    assert spark.read.parquet(live).count() == n0 + 5  # live moved on
    assert snapshot_read(spark, manifest).count() == n0  # snapshot didn't

    assert snapshot_list(str(tmp_path / "snaps")) == ["v1"]


def test_snapshot_clone_diverges_copy_on_write(spark, sf_dir, tmp_path):
    live = str(tmp_path / "live")
    region = load_table(spark, sf_dir, "region")
    region.write.parquet(live)
    manifest = snapshot_create(live, str(tmp_path / "snaps"), "v1")
    clone = str(tmp_path / "clone")
    snapshot_clone(spark, manifest, clone)
    # writing to the clone must not affect the snapshot or the live table
    region.limit(1).write.mode("append").parquet(clone)
    assert spark.read.parquet(clone).count() == region.count() + 1
    assert snapshot_read(spark, manifest).count() == region.count()
    assert spark.read.parquet(live).count() == region.count()


def test_index_lookup_equals_direct_filter_every_value(spark, sf_dir, tmp_path):
    c = load_table(spark, sf_dir, "customer")
    idx = str(tmp_path / "idx")
    index_build(c, idx, "c_mktsegment", "c_custkey")
    segs = [r.c_mktsegment for r in c.select("c_mktsegment").distinct().collect()]
    for seg in segs:
        via_index = sorted(
            r.c_custkey
            for r in index_lookup(
                spark, c, idx, "c_mktsegment", "c_custkey", seg
            ).collect()
        )
        direct = sorted(
            r.c_custkey for r in c.filter(F.col("c_mktsegment") == seg).collect()
        )
        assert via_index == direct, seg


def test_index_lookup_missing_value_is_empty(spark, sf_dir, tmp_path):
    c = load_table(spark, sf_dir, "customer")
    idx = str(tmp_path / "idx")
    index_build(c, idx, "c_mktsegment", "c_custkey")
    assert (
        index_lookup(spark, c, idx, "c_mktsegment", "c_custkey", "NO_SUCH").count()
        == 0
    )


def test_index_on_empty_base_table(spark, sf_dir, tmp_path):
    """A zero-row base table writes an index dir with no data files;
    lookup must return empty, not crash on schema inference."""
    c = load_table(spark, sf_dir, "customer").limit(0)
    idx = str(tmp_path / "idx_empty")
    index_build(c, idx, "c_mktsegment", "c_custkey")
    assert (
        index_lookup(spark, c, idx, "c_mktsegment", "c_custkey", "BUILDING").count()
        == 0
    )


def test_snapshot_diff_plans_incremental_backup(spark, sf_dir, tmp_path):
    """The v1->v2 diff must list exactly the appended files and count
    exactly the appended rows."""
    from hbase_support_spark.sources.snapshots import snapshot_diff

    live = str(tmp_path / "live")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.parquet(live)
    m1 = snapshot_create(live, str(tmp_path / "snaps"), "v1")
    nation.limit(7).write.mode("append").parquet(live)
    m2 = snapshot_create(live, str(tmp_path / "snaps"), "v2")

    d = snapshot_diff(spark, m1, m2)
    assert d["removed_files"] == []
    assert d["added_rows"] == 7
    assert len(d["added_files"]) >= 1
    # and the reverse direction sees the files as removed
    rd = snapshot_diff(spark, m2, m1)
    assert rd["added_files"] == [] and rd["removed_files"] == d["added_files"]


def test_index_incremental_update_rewrites_only_touched_buckets(
    spark, sf_dir, tmp_path
):
    """The incremental path must (a) return exactly the post-upsert
    row set for every segment — stale entries gone, new present —
    and (b) leave every untouched bucket's files byte-identical on
    disk (bucket-bounded write amplification, the point of the op)."""
    import os

    from hbase_support_spark.sources.indexes import index_incremental_update

    c = load_table(spark, sf_dir, "customer")
    idx = str(tmp_path / "idx")
    index_build(c, idx, "c_mktsegment", "c_custkey")

    def files_by_bucket():
        out = {}
        for d in os.listdir(idx):
            if d.startswith("bucket="):
                p = os.path.join(idx, d)
                out[d] = {
                    f: os.path.getmtime(os.path.join(p, f))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                }
        return out

    before = files_by_bucket()
    delta = c.filter(F.col("c_custkey") % 97 == 0).select(
        F.lit("BUILDING").alias("c_mktsegment"), "c_custkey"
    )
    stats = index_incremental_update(
        spark, idx, c, delta, "c_mktsegment", "c_custkey"
    )
    after = files_by_bucket()

    # write amplification: delta touches the old segments' buckets +
    # BUILDING's bucket, far below the full 16
    assert 1 <= stats["buckets_rewritten"] < stats["buckets_total"]
    touched_dirs = {f"bucket={b}" for b in stats["buckets"]}
    for b in before:
        if b not in touched_dirs:
            assert before[b] == after[b], f"untouched {b} was rewritten"
    assert any(
        b in after and before[b] != after[b] for b in touched_dirs if b in before
    )

    # correctness per segment against the merged base
    merged = c.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 97 == 0, F.lit("BUILDING")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    for seg in [r[0] for r in merged.select("c_mktsegment").distinct().collect()]:
        got = {
            r[0]
            for r in index_lookup(
                spark, merged, idx, "c_mktsegment", "c_custkey", seg
            )
            .select("c_custkey")
            .collect()
        }
        want = {
            r[0]
            for r in merged.filter(F.col("c_mktsegment") == seg)
            .select("c_custkey")
            .collect()
        }
        assert got == want, f"segment {seg}: index drift"
