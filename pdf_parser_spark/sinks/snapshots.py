"""Snapshot-manifest table layer — the Iceberg-shaped commit log the
north rule's "resumable from Iceberg snapshot checkpoints" maps to,
implemented over plain parquet so it runs in this sandbox and swaps
1:1 for a real Iceberg catalog on a cluster.

An Iceberg table is data files + an immutable metadata log: each
commit writes a new manifest listing the table's files and stats,
and readers pin a snapshot id. This module reproduces exactly that
dataflow:

  <table>/
    data/<uuid>/part-*.parquet     one directory per committed batch
    _snapshots/v<N>.json           manifest: batch dirs, row counts,
                                   parent snapshot, operation, summary

  commit(spark, df, table, op)  -> snapshot dict (atomic: data lands
                                   first, the manifest rename IS the
                                   commit — readers never see a
                                   half-written batch)
  read(spark, table, snapshot_id=None)
                                -> DataFrame AT a snapshot (time
                                   travel; default = current)
  snapshots(table)              -> the log, oldest→newest
  rollback(table, snapshot_id)  -> new snapshot whose file set is the
                                   old one (history is never erased —
                                   the Iceberg rollback contract)

Scale notes: a manifest holds batch-directory paths + counts, never
row data — O(commits), driver-side JSON. Readers plan one parquet
scan over the snapshot's directories (partition pruning and column
pruning work unchanged). Writers append new directories only: no
read-modify-write of data, so commits from a resumed job are
idempotent at the batch level. Reference anchor: this replaces the
reference's overwrite-in-place outputs (orchestrate.py) with an
audit-able append log; jobs/extract.py's anti-join resume composes
with it (resume reads the CURRENT snapshot's url set).
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _snap_dir(table: str) -> Path:
    return Path(table) / "_snapshots"


def _load(p: Path) -> dict:
    return json.loads(p.read_text())


def snapshots(table: str) -> list[dict]:
    """Commit log, oldest → newest (empty for a fresh table)."""
    d = _snap_dir(table)
    if not d.exists():
        return []
    versions = sorted(
        (int(p.stem[1:]), p) for p in d.glob("v*.json") if p.stem[1:].isdigit()
    )
    return [_load(p) for _, p in versions]


def current_snapshot(table: str) -> dict | None:
    log = snapshots(table)
    return log[-1] if log else None


def commit(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    operation: str = "append",
    summary: dict | None = None,
) -> dict:
    """Write df as a new immutable batch + manifest. Atomicity: the
    batch directory is fully written before the manifest file is
    moved into place with an atomic rename; a crash before the rename
    leaves an orphan data directory (invisible to every reader) and
    no new snapshot."""
    batch = f"data/{uuid.uuid4().hex}"
    batch_path = str(Path(table) / batch)
    df.write.mode("error").parquet(batch_path)
    n_rows = spark.read.parquet(batch_path).count()  # footer-count, cheap

    parent = current_snapshot(table)
    if operation == "append" and parent is not None:
        files = list(parent["batches"]) + [batch]
        total = parent["total_rows"] + n_rows
    else:  # overwrite (or first commit): new file set
        files = [batch]
        total = n_rows
    snap = {
        "snapshot_id": (parent["snapshot_id"] + 1) if parent else 1,
        "parent_id": parent["snapshot_id"] if parent else None,
        "operation": operation,
        "batches": files,
        "batch_rows": n_rows,
        "total_rows": total,
        "summary": summary or {},
    }
    d = _snap_dir(table)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".v{snap['snapshot_id']}.json.tmp"
    tmp.write_text(json.dumps(snap, indent=1))
    os.replace(tmp, d / f"v{snap['snapshot_id']}.json")  # the commit point
    return snap


def read(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame:
    """DataFrame at a snapshot (time travel); default = current.
    Raises for an unknown snapshot or an empty table."""
    log = snapshots(table)
    if not log:
        raise FileNotFoundError(f"no snapshots at {table}")
    if snapshot_id is None:
        snap = log[-1]
    else:
        by_id = {s["snapshot_id"]: s for s in log}
        if snapshot_id not in by_id:
            raise KeyError(f"snapshot {snapshot_id} not in {sorted(by_id)}")
        snap = by_id[snapshot_id]
    paths = [str(Path(table) / b) for b in snap["batches"]]
    return spark.read.parquet(*paths)


def rollback(table: str, snapshot_id: int) -> dict:
    """Make the table's CURRENT state an older snapshot's file set by
    committing a new 'rollback' snapshot pointing at it — history
    stays intact (Iceberg semantics: rollback is itself a commit)."""
    log = snapshots(table)
    by_id = {s["snapshot_id"]: s for s in log}
    if snapshot_id not in by_id:
        raise KeyError(f"snapshot {snapshot_id} not in {sorted(by_id)}")
    target, head = by_id[snapshot_id], log[-1]
    snap = {
        "snapshot_id": head["snapshot_id"] + 1,
        "parent_id": head["snapshot_id"],
        "operation": "rollback",
        "batches": list(target["batches"]),
        "batch_rows": 0,
        "total_rows": target["total_rows"],
        "summary": {"rolled_back_to": snapshot_id},
    }
    d = _snap_dir(table)
    tmp = d / f".v{snap['snapshot_id']}.json.tmp"
    tmp.write_text(json.dumps(snap, indent=1))
    os.replace(tmp, d / f"v{snap['snapshot_id']}.json")
    return snap


def expire_snapshots(table: str, keep_last: int = 2) -> dict:
    """Iceberg's expire_snapshots: drop manifests older than the last
    `keep_last` and DELETE data directories no surviving snapshot
    references. Returns {removed_snapshots, removed_batches}."""
    import shutil

    log = snapshots(table)
    if len(log) <= keep_last:
        return {"removed_snapshots": 0, "removed_batches": 0}
    keep, drop = log[-keep_last:], log[:-keep_last]
    live = {b for s in keep for b in s["batches"]}
    dead = {b for s in drop for b in s["batches"]} - live
    for b in dead:
        shutil.rmtree(Path(table) / b, ignore_errors=True)
    for s in drop:
        (_snap_dir(table) / f"v{s['snapshot_id']}.json").unlink(missing_ok=True)
    return {"removed_snapshots": len(drop), "removed_batches": len(dead)}
