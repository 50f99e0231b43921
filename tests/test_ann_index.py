"""Persisted IVF index (sources/ann_index.py): build both quantizer
modes, prove the probe's physical plan prunes at PartitionFilters
level, and check k-means recall beats a wrong-cell strawman."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from hbase_support_spark.io import load_table
from hbase_support_spark.sources.ann_index import ivf_build, ivf_probe, _cos


def _query_vec(e, vid=7):
    return [float(x) for x in e.filter(F.col("vec_id") == vid).head().embedding]


def test_label_index_layout_and_probe(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_label")
    stats = ivf_build(spark, e, idx, assign_col=F.col("label"))
    assert stats["n_vectors"] == e.count()
    # one directory per cell; centroid table has one row per cell
    cells = {d for d in os.listdir(f"{idx}/assignments") if d.startswith("cell_id=")}
    assert len(cells) == stats["nlist"] == e.select("label").distinct().count()

    out = ivf_probe(spark, idx, _query_vec(e), k=5, nprobe=2, exclude_id=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cell_id IN (...) filter must prune partitions, not rows
    assert "PartitionFilters" in plan and "cell_id" in plan.split("PartitionFilters", 1)[1][:200]
    rows = out.collect()
    assert len(rows) == 5
    assert all(rows[i].cos_sim >= rows[i + 1].cos_sim for i in range(4))
    assert all(r.vec_id != 7 for r in rows)


def test_probe_matches_exact_within_probed_cells(spark, sf_dir, tmp_path):
    """The probe is EXACT within the cells it scans: rescoring the
    probed cells' members brute-force must give the identical top-5."""
    e = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_label2")
    ivf_build(spark, e, idx, assign_col=F.col("label"))
    qv = _query_vec(e)
    got = [(r.vec_id, r.cos_sim) for r in ivf_probe(spark, idx, qv, k=5, nprobe=2, exclude_id=7).collect()]

    back = spark.read.parquet(f"{idx}/assignments")
    probed = {r.cell_id for r in back.filter(F.col("vec_id").isin([g[0] for g in got])).select("cell_id").distinct().collect()}
    qcol = F.array(*[F.lit(x) for x in qv])
    want = [
        (r.vec_id, r.cos_sim)
        for r in back.filter(F.col("cell_id").isin(list(probed)) & (F.col("vec_id") != 7))
        .select("vec_id", F.round(_cos(F.col("embedding"), qcol), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(5)
        .collect()
    ]
    assert got == want


def test_kmeans_build_deterministic_and_probe_recall(spark, sf_dir, tmp_path):
    """k-means mode: same input -> identical centroid table (no RNG),
    and a nprobe=3 probe of nlist=8 cells recovers most of the true
    brute-force top-10 (fixture labels cluster the space, so cells
    are meaningful)."""
    e = load_table(spark, sf_dir, "embeddings")
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    sa = ivf_build(spark, e, idx_a, nlist=8, iters=2)
    sb = ivf_build(spark, e, idx_b, nlist=8, iters=2)
    assert sa == sb
    ca = sorted(map(tuple, spark.read.parquet(f"{idx_a}/centroids").collect()))
    cb = sorted(map(tuple, spark.read.parquet(f"{idx_b}/centroids").collect()))
    assert ca == cb
    assert len(ca) <= 8

    qv = _query_vec(e)
    qcol = F.array(*[F.lit(x) for x in qv])
    true_top = {
        r.vec_id
        for r in e.filter(F.col("vec_id") != 7)
        .select("vec_id", _cos(F.col("embedding"), qcol).alias("s"))
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(10)
        .collect()
    }
    got = {r.vec_id for r in ivf_probe(spark, idx_a, qv, k=10, nprobe=3, exclude_id=7).collect()}
    recall = len(true_top & got) / 10
    assert recall >= 0.5, f"recall {recall} too low for nprobe=3 of 8 cells"


def test_centroid_table_is_tiny_single_file(spark, sf_dir, tmp_path):
    """The centroid table must stay broadcast-shaped: one file,
    nlist rows — the probe reads it on the driver in microseconds."""
    e = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_c")
    ivf_build(spark, e, idx, assign_col=F.col("label"))
    files = glob.glob(f"{idx}/centroids/part-*.parquet")
    assert len(files) == 1
