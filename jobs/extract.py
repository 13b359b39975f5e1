"""Resumable distributed extraction job (spark-submit entry point).

    spark-submit --py-files pdf_parser_spark.zip jobs/extract.py \
        --input  /data/documents.parquet \
        --outdir /data/out \
        [--resume] [--partitions 2048] [--cpus 32]

Pipeline (SURVEY §3 lifecycle → north_rule operational contract):

  documents(url, warc_ts, html, text, lang)
    → anti-join already-extracted urls        (resume checkpoint)
    → salted repartition xxhash64(url, salt)  (host/mega-doc skew)
    → mapInPandas per-document extraction     (zero further shuffles)
    → append to <outdir>/extracted            (the checkpoint itself)
    → flat side tables toc/ chunks/ validation/ doc_metrics/ lineage/
      derived from THIS batch only and APPENDED (incremental: a resume
      run's side-table cost ∝ new docs, never corpus size)

Checkpoint/resume semantics: the extracted table IS the checkpoint —
every completed write lands a consistent batch of whole documents, and
`--resume` anti-joins its url set so a restarted job only processes
the remainder. On Iceberg this maps 1:1 to snapshot-based restart
(`overwritePartitions` + the same anti-join against the last
snapshot); parquet append is the sandbox stand-in with identical
dataflow. Idempotent per url either way.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pdf_parser_spark.operators import extract as ox  # noqa: E402
from pdf_parser_spark.plans.session import get_spark  # noqa: E402
from pdf_parser_spark.sources.corpus import read_documents  # noqa: E402


def _parquet_files(path: str) -> set[str]:
    """Data-file set of a local parquet table (any partition layout)."""
    p = Path(path)
    if not p.exists():
        return set()
    return {str(f) for f in p.rglob("*.parquet") if f.is_file()}


def run(
    input_path: str,
    outdir: str,
    resume: bool = False,
    partitions: int | None = None,
    cpus: int | None = None,
    spark=None,
    url_buckets: int | None = None,
    snapshots: bool = False,
) -> dict:
    """`url_buckets=N` writes the extracted table partitioned by
    `url_bucket = pmod(xxhash64(url), N)` — the parquet stand-in for
    Iceberg's `bucket(N, url)` partition spec: point lookups and the
    resume anti-join prune to one bucket directory, and downstream
    url-keyed joins co-locate.

    `snapshots=True` commits each batch through the snapshot-manifest
    layer (sinks/snapshots.py) instead of a plain directory append:
    every run lands an atomic, time-travelable snapshot, and resume
    anti-joins the CURRENT snapshot's url set — the literal
    Iceberg-checkpoint shape of the north rule."""
    if url_buckets and snapshots:
        raise ValueError("url_buckets and snapshots are separate layouts; pick one")
    if "://" in outdir:
        # side-table batch tracking + the snapshot manifest log use
        # local-FS semantics (Path.rglob / os.link); same fail-fast
        # contract as jobs/compact.py — on a cluster, outdir is an
        # Iceberg table and the incremental scan replaces the file diff
        raise ValueError(
            f"jobs/extract.py writes to local filesystem paths only, got {outdir!r}; "
            "for object-store tables use an Iceberg catalog (docs/RUNBOOK.md)"
        )
    spark = spark or get_spark(app_name="extract-job", cpus=cpus)
    out = Path(outdir)
    extracted_path = str(out / "extracted")

    from pyspark.errors import AnalysisException

    from pdf_parser_spark.sinks import snapshots as sn

    docs = read_documents(spark, input_path)
    n_input = docs.count()

    n_already = 0
    if resume:
        try:
            done_tbl = (
                sn.read(spark, extracted_path)
                if snapshots
                else spark.read.parquet(extracted_path)
            )
        except FileNotFoundError:
            done_tbl = None  # fresh snapshot table → full run
        except AnalysisException as e:
            # ONLY missing-table means "nothing extracted yet"; a
            # corrupt manifest / unreadable checkpoint must abort, or
            # the job silently re-extracts and appends duplicates
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                done_tbl = None
            else:
                raise
        if done_tbl is not None:
            done = done_tbl.select("url").distinct()
            n_already = done.count()
            # broadcast when the processed set is small; Catalyst/AQE
            # picks SMJ automatically once it grows past the threshold
            docs = docs.join(done, on="url", how="left_anti")

    todo = ox.salted_repartition(docs, partitions)
    extracted = ox.extract_documents(todo)
    t0 = time.perf_counter()
    snap = None
    if snapshots:
        snap = sn.commit(
            spark, extracted, extracted_path,
            summary={"job": "extract", "resume": resume},
        )
        new_batch = sn.read_incremental(spark, extracted_path, snap["snapshot_id"])
    else:
        # plain-append stand-in for the Iceberg incremental scan:
        # file-set diff around the write identifies the new batch
        before = _parquet_files(extracted_path)
        if url_buckets:
            bucketed = extracted.withColumn(
                "url_bucket", F.pmod(F.xxhash64("url"), F.lit(url_buckets))
            )
            bucketed.write.mode("append").partitionBy("url_bucket").parquet(extracted_path)
        else:
            extracted.write.mode("append").parquet(extracted_path)
        new_files = sorted(_parquet_files(extracted_path) - before)
        new_batch = spark.read.parquet(*new_files) if new_files else None
    wall = time.perf_counter() - t0

    # side tables derive from THIS batch only and APPEND — they are
    # row-wise per-url projections, so append composes, and a resume
    # run that adds 0.1% new docs touches 0.1% of the data instead of
    # overwrite-rewriting corpus-sized tables (the r3 scale-killer).
    # Reading the just-written batch back from disk keeps every stage
    # restartable without re-running the extract UDF.
    n_new = 0
    status_counts: dict[str, int] = {}
    t_side0 = time.perf_counter()
    if new_batch is not None:
        from pyspark.sql import Observation

        obs = Observation()
        observed = new_batch.observe(obs, F.count(F.lit(1)).alias("rows"))
        ox.toc_table(observed).write.mode("append").parquet(str(out / "toc"))
        ox.chunks_table(new_batch).write.mode("append").parquet(str(out / "chunks"))
        ox.validation_table(new_batch).write.mode("append").parquet(str(out / "validation"))
        ox.metrics_table(new_batch).write.mode("append").parquet(str(out / "doc_metrics"))
        ox.lineage_metrics(new_batch).write.mode("append").parquet(str(out / "lineage"))
        status_counts = {
            r["status"]: r["n"]
            for r in new_batch.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        n_new = int(obs.get["rows"])
    side_sec = time.perf_counter() - t_side0

    # totals compose from the checkpoint + this batch — no full-table
    # re-count (snapshots mode reads the manifest's running total,
    # which also covers pre-existing batches a non-resume append
    # chained onto)
    n_total = snap["total_rows"] if snap is not None else n_already + n_new
    summary = {
        "input_docs": n_input,
        "already_extracted": n_already,
        "newly_extracted": n_new,
        "total_extracted": n_total,
        "wall_sec_extract": round(wall, 2),
        "wall_sec_side_tables": round(side_sec, 2),
        "docs_per_sec": round(n_new / wall, 2) if wall > 0 else None,
        "status_counts": status_counts,
        "side_table_rows_processed": n_new,
    }
    if snap is not None:
        summary["snapshot_id"] = snap["snapshot_id"]
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--url-buckets", type=int, default=None)
    ap.add_argument("--snapshots", action="store_true")
    args = ap.parse_args()
    summary = run(
        args.input, args.outdir, args.resume, args.partitions, args.cpus,
        url_buckets=args.url_buckets, snapshots=args.snapshots,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
