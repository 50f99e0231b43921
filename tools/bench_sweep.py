"""Full-registry wall-clock sweep — the end-of-round perf census.

Runs EVERY registered query at the bench SF with a noop sink (plan
executes, results discarded — no collect skew) and prints a sorted
timing table plus the total. This is the number BENCH.md tracks
round-over-round: the registry must be able to grow without the
sweep total growing super-linearly, and no single query may drift
past its documented ceiling unnoticed.

Usage: python tools/bench_sweep.py [sf_dir] [name_filter ...]
Default: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, all queries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from hbase_support_spark import QUERIES, get_spark, load_all


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    names = sys.argv[2:]
    load_all()
    spark = get_spark(
        "bench-sweep",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
    )
    QUERIES["agg_rowcount"](spark, sf_dir).collect()  # warm
    todo = [n for n in QUERIES if not names or any(f in n for f in names)]
    times: dict[str, float] = {}
    failed: list[str] = []
    t_all = time.perf_counter()
    for name in todo:
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
    total = time.perf_counter() - t_all
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{name:36s} {dt:7.3f}s")
    print(
        f"\nTOTAL {total:.1f}s for {len(times)}/{len(todo)} queries at "
        f"{sf_dir} ({len(failed)} failed)"
    )
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
