"""HBase-style table snapshots over Parquet — zero-copy manifests.

HBase snapshots don't copy data: they write a manifest referencing
the table's immutable HFiles, so creation is O(metadata) and a
restore/clone just re-links files. Parquet files written by this
engine are equally immutable, so the same design maps directly:

  snapshot_create  -> manifest JSON listing the table's data files
  snapshot_read    -> read exactly those files (point-in-time view,
                      immune to later writes/compactions that ADD or
                      REPLACE files in the live directory)
  snapshot_clone   -> new live table dir re-referencing the files
                      (copy-on-write: the clone diverges only when
                      written to)

At 100 TB this is the difference between an O(1) metadata operation
and re-shuffling the table; it is also the only consistent-backup
primitive that doesn't pause writes. The restore path reads the
manifest on the driver (tiny) — the data files are opened by
executors as a normal parquet scan, with pushdown/pruning intact.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _data_files(table_dir: str) -> list[str]:
    return sorted(
        os.path.join(table_dir, f)
        for f in os.listdir(table_dir)
        if f.endswith(".parquet") and not f.startswith("_")
    )


def snapshot_create(table_dir: str, snap_dir: str, name: str) -> str:
    """Write a manifest referencing the table's current data files.
    O(metadata): no data is read or copied."""
    manifest = {
        "name": name,
        "table_dir": os.path.abspath(table_dir),
        "files": _data_files(table_dir),
    }
    os.makedirs(snap_dir, exist_ok=True)
    path = os.path.join(snap_dir, f"{name}.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def snapshot_read(spark: SparkSession, manifest_path: str) -> DataFrame:
    """Point-in-time read: exactly the files the manifest pinned,
    regardless of what the live directory looks like now."""
    with open(manifest_path) as f:
        manifest = json.load(f)
    return spark.read.parquet(*manifest["files"])


def snapshot_clone(spark: SparkSession, manifest_path: str, clone_dir: str) -> None:
    """Materialize a live table from a snapshot (HBase clone_snapshot).
    Copy-on-write semantics start here: the clone re-writes the
    snapshot's rows into its own directory (in HDFS-backed HBase this
    is a hard-link; on generic storage one sequential copy)."""
    snapshot_read(spark, manifest_path).write.mode("overwrite").parquet(clone_dir)


def snapshot_list(snap_dir: str) -> list[str]:
    if not os.path.isdir(snap_dir):
        return []
    return sorted(f[:-5] for f in os.listdir(snap_dir) if f.endswith(".json"))


def snapshot_diff(spark: SparkSession, manifest_a: str, manifest_b: str) -> dict:
    """Incremental-backup planning (HBase ExportSnapshot's delta
    mode): compare two snapshots of the same table by FILE, the
    O(metadata) fast path immutability enables — only files added
    since snapshot A need shipping; removed files are compactions.
    Returns the file-level delta plus exact row counts for the added
    set (one pruned scan of just those files)."""
    with open(manifest_a) as f:
        a = set(json.load(f)["files"])
    with open(manifest_b) as f:
        b = set(json.load(f)["files"])
    added, removed = sorted(b - a), sorted(a - b)
    added_rows = spark.read.parquet(*added).count() if added else 0
    return {
        "added_files": added,
        "removed_files": removed,
        "added_rows": added_rows,
    }
