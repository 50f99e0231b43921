"""Compaction preserves content and actually reduces file count."""

from __future__ import annotations

from hbase_support_spark.io import load_table
from hbase_support_spark.sources.compaction import compact, plan_compaction


def test_compact_small_files(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # simulate streaming-sink sprawl: 32 tiny files
    orders.repartition(32).write.mode("overwrite").parquet(src)
    before = plan_compaction(spark, src)
    assert before["n_files"] == 32

    result = compact(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert result["after"]["n_files"] < before["n_files"]
    assert result["after"]["total_bytes"] > 0

    back = spark.read.parquet(dst)
    assert back.count() == orders.count()
    # fp sums differ in final ulps across partitionings; round like
    # every oracle does — and also compare an order-free exact digest
    got = back.selectExpr("round(sum(o_totalprice), 2)", "bit_xor(xxhash64(o_orderkey))")
    want = orders.selectExpr("round(sum(o_totalprice), 2)", "bit_xor(xxhash64(o_orderkey))")
    assert got.collect() == want.collect()
