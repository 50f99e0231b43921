"""Full-registry wall-clock sweep — the end-of-round perf census.

Runs EVERY registered query at the bench SF with a noop sink (plan
executes, results discarded — no collect skew) and prints a sorted
timing table plus the total. This is the number BENCH.md tracks
round-over-round: the registry must be able to grow without the
sweep total growing super-linearly, and no single query may drift
past its documented ceiling unnoticed.

Transient-failure policy (r8, VERDICT r07 item 4): marathon censuses
occasionally hit py4j ``ConnectionRefused``-class socket flakes (4
false alarms in the r7 405-query run, each clean standalone). A
failed query is therefore retried up to ``_RETRIES`` times — on a
FRESH SparkSession if the old one's JVM bridge died — and the output
separates ``flaked-then-passed`` (retry succeeded; timed from the
successful attempt; listed in a flake ledger) from genuine failures
(all attempts failed; non-zero exit). A flake is an observation
about the harness socket, not the query, so it does not fail the
census.

Usage: python tools/bench_sweep.py [sf_dir] [name_filter ...]
Default: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, all queries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from hbase_support_spark import QUERIES, get_spark, load_all

_RETRIES = 2  # attempts after the first failure


def _fresh_spark():
    return get_spark(
        "bench-sweep",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
    )


def _session_alive(spark) -> bool:
    try:
        return spark.range(1).count() == 1
    except Exception:  # noqa: BLE001 — any bridge error means dead
        return False


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    names = sys.argv[2:]
    load_all()
    spark = _fresh_spark()
    QUERIES["agg_rowcount"](spark, sf_dir).collect()  # warm
    todo = [n for n in QUERIES if not names or any(f in n for f in names)]
    times: dict[str, float] = {}
    flaked: dict[str, str] = {}  # name -> first-attempt error summary
    failed: list[str] = []
    t_all = time.perf_counter()
    for name in todo:
        last_err = None
        for attempt in range(1 + _RETRIES):
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[name] = time.perf_counter() - t0
                if attempt:
                    flaked[name] = last_err
                    print(
                        f"FLAKED-THEN-PASSED {name} (attempt "
                        f"{attempt + 1}): first error was {last_err}"
                    )
                break
            except Exception as e:  # noqa: BLE001
                last_err = f"{type(e).__name__}: {str(e)[:160]}"
                print(
                    f"FAIL {name} (attempt {attempt + 1}/{1 + _RETRIES}): "
                    f"{last_err}"
                )
                if not _session_alive(spark):
                    print("  spark session dead — restarting JVM bridge")
                    try:
                        spark.stop()
                    except Exception:  # noqa: BLE001
                        pass
                    spark = _fresh_spark()
        else:
            failed.append(name)
    total = time.perf_counter() - t_all
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{name:36s} {dt:7.3f}s")
    print(
        f"\nTOTAL {total:.1f}s for {len(times)}/{len(todo)} queries at "
        f"{sf_dir} ({len(flaked)} flaked-then-passed, {len(failed)} failed)"
    )
    if flaked:
        print("flake ledger (retry succeeded — harness socket, not query):")
        for name, err in flaked.items():
            print(f"  {name}: {err}")
    if failed:
        print("failed (all attempts):", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
