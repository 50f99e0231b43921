"""Headline benchmark — the driver's per-round performance probe.

Runs the BASELINE.md query set through the engine's registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], warm best-of-2 per query (same method as
BASELINE.md), and prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbase_support_spark import get_spark, load_all
from hbase_support_spark import registry

# headline name -> registry query (keys mirror BASELINE.md rows)
HEADLINE = {
    "q1_pricing_summary": "agg_sum_min_max_avg",
    "q3_shipping_priority": "join_shipping_priority_topk",
    "q5_local_supplier": "join_multiway_star",
    "window_topk_per_cust": "win_row_number_topk",
    # BASELINE.md's events_sessionize_agg row is a 2-key agg; the
    # extra sessionize_30m_full row is true (heavier) sessionization.
    "events_sessionize_agg": "events_profile_agg",
    "sessionize_30m_full": "stream_session_30m",
    "events_tumbling_window": "stream_tumbling_1h",
    "distinct_users": "agg_distinct_users",
    "dedup_exact": "dedup_exact",
    "sim_knn_query": "sim_knn_query",
    "sim_pairs_blas": "sim_pairs_threshold_blas",
}

RUNS = 2

# Host-idleness gate (VERDICT r10 item 2): BENCH_r10 vs a same-day
# same-code re-measure disagreed by 21% with loadavg 2.2+ at start —
# round-over-round deltas were unattributable without a manual
# identical-tree control. The bench now WAITS for the 1-min loadavg
# to drop under the gate (up to IDLE_WAIT seconds, polling) and then
# labels the run host_idle true/false, so the recorded JSON itself
# says whether the number is comparable. It labels rather than
# refuses: the driver must always get its one JSON line.
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "1.5"))
IDLE_WAIT = float(os.environ.get("SPARK_GRAFT_IDLE_WAIT", "90"))


def _wait_for_idle() -> tuple[float, float, bool]:
    """(loadavg_at_entry, wait_spent, is_idle_now)."""
    entry = os.getloadavg()[0]
    waited, load = 0.0, entry
    while load > LOAD_GATE and waited < IDLE_WAIT:
        time.sleep(5.0)
        waited += 5.0
        load = os.getloadavg()[0]
    return entry, waited, load <= LOAD_GATE


LOAD_ENTRY, IDLE_WAITED, HOST_IDLE = _wait_for_idle()
LOAD_START = os.getloadavg()


def _cpu_cal() -> float:
    """Single-core CPU calibration marker (round 9).

    A fixed pure-python loop timed before Spark starts. Guest loadavg
    cannot see HOST contention on a VM: round 9 opened with every
    headline query uniformly ~30% slower than round 8's idle reading
    on an identical tree at loadavg 0.2 — unexplainable guest-side.
    This marker gives each bench JSON an absolute single-core speed
    reading so a uniform drift can be attributed to the machine (cal
    moved with it) vs the plans (cal flat). Reference: 2.09 s on the
    round-8/9 host at nominal 2.1 GHz.
    """
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    assert s == 199999990000000
    return round(time.perf_counter() - t0, 3)


# The "idle triple" control (VERDICT r10 item 2): three consecutive
# calibration readings taken automatically so the judge can separate
# code from host without a manual re-run. A tight triple (spread
# under ~10%) means the single-core speed was stable while the bench
# ran; min is the comparable number (least-contended sample).
CPU_CAL_TRIPLE = [_cpu_cal() for _ in range(3)]
CPU_CAL = min(CPU_CAL_TRIPLE)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_all()
    # 8 initial shuffle partitions at bench SF (same as BASELINE.md's
    # method); AQE re-coalesces at runtime either way. At cluster
    # scale this knob is ~2-3x total cores — see session.py.
    spark = get_spark("bench", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")))
    # warm the JVM/reader paths once so per-query numbers measure the
    # plan, not first-touch classloading (same method as BASELINE.md)
    registry.QUERIES["agg_rowcount"](spark, sf_dir).collect()

    per_query: dict[str, float] = {}
    for name, qname in HEADLINE.items():
        fn = registry.QUERIES[qname]
        # one unmeasured warm run per query, then best-of-2 measured:
        # a fresh session's first executions ride the JVM tiered-JIT
        # compile curve (measured: q1 falls 0.78 -> 0.41 s over six
        # reps with zero plan change), so sampling runs 2-3 measures
        # the PLAN, not compile luck. BASELINE.md's column was itself
        # "run twice warm"; this keeps the comparison apples-to-apples
        # and round-over-round numbers interpretable (VERDICT r05
        # item 4 adjudication — the r4->r5 'drift' was JIT depth).
        fn(spark, sf_dir).collect()
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)

    total = round(sum(per_query.values()), 3)
    # machine-load marker (VERDICT r05 item 7): the r4->r5 comparison
    # was muddied by a concurrent census sweep; loadavg at start/end
    # makes the driver's number interpretable (cold_start: whether
    # this process paid the JVM/classloader warmup, always True for
    # a fresh `python bench.py`; the warmup query absorbs it).
    load_end = os.getloadavg()
    print(
        json.dumps(
            {
                "metric": "headline_total_best_of_2",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "loadavg_entry_1m": round(LOAD_ENTRY, 2),
                "loadavg_start_1m": round(LOAD_START[0], 2),
                "loadavg_end_1m": round(load_end[0], 2),
                # entry-state only: the bench's own 32-thread work
                # legitimately inflates the END loadavg
                "host_idle": HOST_IDLE,
                "idle_gate": LOAD_GATE,
                "idle_wait_sec": IDLE_WAITED,
                "cpu_cal_sec": CPU_CAL,
                "cpu_cal_triple": CPU_CAL_TRIPLE,
                "cpus": os.cpu_count(),
                "method": "warm1_best_of_2",
            }
        )
    )


if __name__ == "__main__":
    main()
