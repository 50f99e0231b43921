"""Partition-invariance sweep — the determinism axis the DuckDB
oracle cannot see.

A query can match its oracle under one partitioning and still be
nondeterministic (accumulation-order float sums, missing tie-breaks
at a LIMIT boundary, partition-dependent sampling). This tool runs
every registered query under two deliberately different layouts
(5 shuffle partitions on 5 cores vs 17 on 16) and compares full
result multisets; any divergence is a determinism bug that would
surface as a driver hash flake on some future fixture regen.

Usage: python tools/invariance_sweep.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from hbase_support_spark import QUERIES, get_spark, load_all


def snapshot(shuffle: int, cores: int, sf_dir: str, names: list[str]) -> dict:
    spark = get_spark(
        f"inv{shuffle}", master=f"local[{cores}]", shuffle_partitions=shuffle
    )
    out = {}
    for n in names:
        try:
            rows = QUERIES[n](spark, sf_dir).collect()
            out[n] = sorted(tuple(str(v) for v in r) for r in rows)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            out[n] = f"ERR {type(ex).__name__}: {str(ex)[:120]}"
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    load_all()
    names = [n for n in QUERIES if not filters or any(f in n for f in filters)]
    a = snapshot(5, 5, sf_dir, names)
    b = snapshot(17, 16, sf_dir, names)
    errs = [n for n in names if isinstance(a[n], str) or isinstance(b[n], str)]
    bad = [n for n in names if a[n] != b[n]]
    print("ERRS:", errs if errs else "none")
    print("MISMATCH:", bad if bad else "none", "| checked", len(names))
    if bad or errs:
        sys.exit(1)


if __name__ == "__main__":
    main()
