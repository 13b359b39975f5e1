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


class CommitConflictError(RuntimeError):
    """Another writer committed the same snapshot version first.

    Real Iceberg fails the losing compare-and-swap against the catalog;
    here the exclusive hard-link of the manifest is the CAS. Retrying
    commit() re-reads the new current snapshot and chains onto it (the
    data batch is already on disk and stays referenced)."""


def _check_local(table: str) -> None:
    # the manifest log uses Path / os.link / os.replace — local FS
    # semantics; on a cluster the layer swaps for a real Iceberg
    # catalog (docs/RUNBOOK.md)
    from ..fsutil import ensure_local_path

    ensure_local_path(table, "sinks/snapshots.py")


def _snap_dir(table: str) -> Path:
    return Path(table) / "_snapshots"


def _load(p: Path) -> dict:
    return json.loads(p.read_text())


def _publish(snap: dict, table: str) -> None:
    """Atomically publish a manifest with conflict detection: write to
    a tmp file, then hard-link it to the final name. os.link fails with
    FileExistsError if the version already exists — the losing writer
    gets CommitConflictError instead of silently clobbering the other
    writer's committed batch (which os.replace would)."""
    d = _snap_dir(table)
    d.mkdir(parents=True, exist_ok=True)
    final = d / f"v{snap['snapshot_id']}.json"
    tmp = d / f".v{snap['snapshot_id']}.{os.getpid()}.json.tmp"
    tmp.write_text(json.dumps(snap, indent=1))
    try:
        os.link(tmp, final)  # the commit point (exclusive CAS)
    except FileExistsError:
        raise CommitConflictError(
            f"snapshot v{snap['snapshot_id']} at {table} was committed by a "
            "concurrent writer; re-read the current snapshot and retry"
        ) from None
    finally:
        tmp.unlink(missing_ok=True)


def snapshots(table: str) -> list[dict]:
    """Commit log, oldest → newest (empty for a fresh table)."""
    _check_local(table)
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
    no new snapshot. Concurrent commits race on the manifest version;
    the loser gets CommitConflictError (see _publish), never a silent
    clobber."""
    _check_local(table)
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
        # the batch THIS commit added — Iceberg's incremental-scan
        # handle: jobs derive per-batch side tables from it without
        # re-reading the whole table (read_incremental)
        "new_batches": [batch],
        "batch_rows": n_rows,
        "total_rows": total,
        "summary": summary or {},
    }
    _publish(snap, table)
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


def read_incremental(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame | None:
    """DataFrame over ONLY the batch a snapshot added (Iceberg
    incremental scan between a snapshot and its parent). Returns None
    for snapshots that added no data (e.g. rollback). Pre-round-4
    manifests without `new_batches` fall back to the full file set of
    a first commit, else None."""
    log = snapshots(table)
    if not log:
        raise FileNotFoundError(f"no snapshots at {table}")
    snap = log[-1] if snapshot_id is None else next(
        (s for s in log if s["snapshot_id"] == snapshot_id), None
    )
    if snap is None:
        raise KeyError(f"snapshot {snapshot_id} not in {[s['snapshot_id'] for s in log]}")
    new = snap.get("new_batches")
    if new is None:
        new = snap["batches"] if snap.get("parent_id") is None else []
    if not new:
        return None
    return spark.read.parquet(*(str(Path(table) / b) for b in new))


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
        "new_batches": [],
        "batch_rows": 0,
        "total_rows": target["total_rows"],
        "summary": {"rolled_back_to": snapshot_id},
    }
    _publish(snap, table)
    return snap


def remove_orphans(table: str, min_age_sec: float = 86400.0) -> dict:
    """Iceberg's remove_orphan_files: delete data directories no
    manifest references — crash-before-commit leftovers and losing
    concurrent writers' batches (their CommitConflictError aborts
    AFTER the data write). Unreferenced directories are invisible to
    every READER, but a directory younger than `min_age_sec` may
    belong to a commit in flight (batch written, manifest not yet
    published) — deleting it would corrupt the manifest published a
    moment later, which is exactly why real Iceberg defaults
    older_than to 3 days. Keep the cutoff comfortably above the
    longest batch-write-to-publish gap. Returns {removed_batches,
    skipped_young}."""
    import shutil
    import time as _time

    live = {b for s in snapshots(table) for b in s["batches"]}
    data = Path(table) / "data"
    removed = 0
    skipped = 0
    cutoff = _time.time() - min_age_sec
    if data.exists():
        for d in data.iterdir():
            if not d.is_dir() or f"data/{d.name}" in live:
                continue
            try:
                if d.stat().st_mtime > cutoff:
                    skipped += 1
                    continue
            except OSError:
                continue
            shutil.rmtree(d, ignore_errors=True)
            removed += 1
    return {"removed_batches": removed, "skipped_young": skipped}


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
