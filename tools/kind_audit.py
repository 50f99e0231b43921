"""Registry-wide numeric-kind audit: Spark schema vs DuckDB oracle types.

Executes NO data — builds each query's lazy DataFrame for its schema
and lets DuckDB plan (not run) each oracle. Catches the round-2 failure
class (HUGEINT/DOUBLE/TINYINT oracle columns vs Spark BIGINT/DOUBLE)
across all registered queries in seconds.

Usage: python tools/kind_audit.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from hbase_support_spark import get_spark, load_all, QUERIES, ORACLES
from hbase_support_spark.parity import duckdb_connect, kind_mismatches


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    load_all()
    spark = get_spark("kind-audit", master="local[4]", shuffle_partitions=4)
    con = duckdb_connect(sf_dir)
    todo = [n for n in QUERIES if n in ORACLES and (not names or any(f in n for f in names))]
    bad = {}
    t0 = time.time()
    for name in todo:
        try:
            df = QUERIES[name](spark, sf_dir)
            mism = kind_mismatches(df.dtypes, ORACLES[name], con)
        except Exception as e:  # noqa: BLE001
            mism = [f"EXCEPTION: {type(e).__name__}: {str(e)[:200]}"]
        if mism:
            bad[name] = mism
            print(f"KIND-FAIL {name}")
            for m in mism:
                print(f"    {m}")
    print(f"\n{len(todo) - len(bad)}/{len(todo)} kind-clean in {time.time() - t0:.1f}s")
    if bad:
        print("affected:", ", ".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()
