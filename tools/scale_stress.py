"""Scale-stress harness — runs registry queries on an R-times
replicated copy of a fixture dir (facts replicated with shifted keys
so cardinalities actually grow; dims copied as-is), giving scaling
evidence one decade beyond the largest driver fixture without
touching /root/testdata.

Usage: python tools/scale_stress.py [R] [sf_dir] [query ...]
Default: R=8 over sf0.1 (lineitem 600k -> 4.8M rows) on the heavy
representative set.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hbase_support_spark import QUERIES, get_spark, load_all
from hbase_support_spark.io import TABLES, load_table

# per-table key columns to shift per replica (facts); absent = copy.
# The shift step is computed from the ACTUAL per-column max (+1) at
# build time — a hard-coded step smaller than the real id range would
# collide replicas on that key, so the dimension stops growing and
# per-key timelines interleave across replicas (ADVICE r03).
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_QUERIES = [
    "agg_sum_min_max_avg",
    "stream_session_30m",
    "dedup_exact",
    "dedup_near_minhash",
    "win_row_number_topk",
    "agg_quantile_exact_global",
    "events_feature_pit_join",
    "graph_triangle_count",
    "pipeline_chunk_sliding",
]


def build(spark, src: str, dst: str, r: int) -> None:
    for t in TABLES:
        base = load_table(spark, src, t)
        if t in SHIFT:
            cols = SHIFT[t]
            maxes = base.agg(
                *[F.max(c).alias(c) for c in cols]
            ).first()  # one metadata-scale row per table
            steps = {c: int(maxes[c]) + 1 for c in cols}
            parts = []
            for i in range(r):
                d = base
                for col in cols:
                    d = d.withColumn(col, F.col(col) + F.lit(i * steps[col]))
                parts.append(d)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
        else:
            out = base
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT_QUERIES
    load_all()
    spark = get_spark("stress", shuffle_partitions=32)
    dst = os.path.abspath(f".scratch/stress_x{r}")
    if not os.path.exists(f"{dst}/lineitem.parquet"):
        t0 = time.time()
        build(spark, src, dst, r)
        print(f"built x{r} replica set in {time.time() - t0:.1f}s -> {dst}")
    QUERIES["agg_rowcount"](spark, dst).collect()  # warm
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, dst).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:32s} {best:7.3f}s  (x{r} of {src.rsplit('/',1)[-1]})")


if __name__ == "__main__":
    main()
