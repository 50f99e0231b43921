"""Fixture-regeneration drill — strict parity on data we did NOT
tune against.

The driver regenerates every fixture each round, and both harness
blind spots so far (numeric kinds r02, sign-of-zero r03) were
invisible on the bytes the queries were developed against. This
drill runs the FULL strict (IEEE-bit) parity sweep on a
deliberately different dataset: an R-times replicated copy of the
driver fixture with max-derived key shifts (scale_stress.build), so
group sizes, aggregation orders, join fan-outs, tie patterns, and
near-dup structure (every doc gains an exact cross-replica twin)
all change. A query that only passes on today's bytes — a lucky
ROUND boundary, an untested tie, an order-dependent accumulation —
fails here before the driver's next fixture regen finds it.

Usage: python tools/regen_drill.py [R] [src_sf_dir] [name_filter ...]
Default: R=2 over sf0.01 (driver grading SF), full registry.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from hbase_support_spark import get_spark, load_all, QUERIES, ORACLES
from hbase_support_spark.parity import compare, duckdb_connect
from tools.scale_stress import build


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:]
    load_all()
    spark = get_spark("regen-drill", master="local[8]", shuffle_partitions=8)
    dst = os.path.abspath(f".scratch/regen_x{r}")
    if not os.path.exists(f"{dst}/lineitem.parquet"):
        t0 = time.time()
        build(spark, src, dst, r)
        print(f"built x{r} drill set in {time.time() - t0:.1f}s -> {dst}")
    con = duckdb_connect(dst)
    todo = [n for n in QUERIES if not names or any(f in n for f in names)]
    failed = []
    for name in todo:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, dst)
            if name in ORACLES:
                ok, detail = compare(df, ORACLES[name], con)
            else:
                cnt = df.count()
                ok, detail = True, f"rows-only ({cnt} rows)"
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION: {type(e).__name__}: {str(e)[:300]}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:6.2f}s  {detail}")
        if not ok:
            failed.append(name)
    print(f"\n{len(todo) - len(failed)}/{len(todo)} passed on regen drill x{r}")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
