"""Incremental corpus-profiling job (spark-submit entry point).

    spark-submit --py-files pdf_parser_spark.zip jobs/corpus_profile.py \
        --input  /data/documents.parquet \
        --outdir /data/profile \
        [--resume] [--snapshots] [--cpus 32]

One-pass corpus statistics via the mergeable-sketch family
(operators/sketches.py) — the monitoring side of a 100 TB pipeline:

  documents(url, warc_ts, html, text, lang)
    → anti-join already-profiled urls        (resume checkpoint)
    → ONE cached projection of the new batch (url, lang, fp, text)
    → four sketches from that single scan:
        hll_distinct  (group, idx, rho)      distinct fingerprints/lang
        word_cms      (group, row, col, cnt) word frequencies/lang
        fp_bloom      (group, pos)           fingerprint membership/lang
        len_hist      (group, bucket, cnt)   doc-length quantiles/lang
    → MERGE with the stored sketches         (max / sum / ∪ / sum)
    → overwrite-commit the merged state      (tables stay tiny)
    → append the batch's urls to seen_urls   (the checkpoint)

The point of mergeable sketches is the resume path: profiling a new
batch costs one scan of THE BATCH — the existing corpus is never
re-read, because merge(stored, batch) == rebuild(full) exactly (all
four sketches are deterministic; tests/test_profile_job.py asserts
table-level equality). Sketch tables are bounded at |groups| * m rows
at ANY corpus size, so the merged state is always broadcastable and
the overwrite is O(sketch), not O(corpus).

Crash safety — the SUM-merged sketches (word_cms, len_hist) are NOT
idempotent, so "merge the batch again after a crash" silently
double-counts. Every run is therefore two-phase, keyed by a batch_id:

  stage:  batch sketches + batch urls land under _staging/<batch_id>/
          first, sealed by a _READY marker (no sketch table touched);
  apply:  each table merges FROM THE STAGED FRAMES and records the
          batch_id it last absorbed (snapshot summary, or a
          _batch_id.json inside the table directory committed by the
          same atomic rename as the data). Re-applying is a per-table
          no-op when the recorded id matches — a crash between table
          commits resumes exactly where it stopped, never re-merging.

The next run (any flags) first completes a sealed pending batch from
its staged frames — the INPUT is not consulted for recovery — then
clears staging and profiles new documents. Unsealed staging (crash
mid-stage) is discarded; no sketch table saw the batch. Plain-mode
table swaps are also self-healing: the merged state is fully written
to <table>.tmp (sealed by _COMMIT_READY) before the old directory is
replaced, and _recover_plain_swaps finishes or discards interrupted
swaps on the next run.

`--snapshots` commits each sketch table through the snapshot-manifest
layer (sinks/snapshots.py): every profiling run is one atomic,
time-travelable overwrite commit per table — `read(spark, tbl, i)`
gives the corpus statistics as of batch i.

Sketch parameters are pinned in <outdir>/_profile_meta.json on the
first run; a resume with different parameters ABORTS (registers built
at p=12 cannot merge with p=13).

Generalizes the reference's per-run metrics report (SURVEY §2:
metrics.py writes one JSON per pipeline run) to corpus-scale rolling
statistics.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pdf_parser_spark.functions.text_metrics import fingerprint, word_array  # noqa: E402
from pdf_parser_spark.operators import sketches as sk  # noqa: E402
from pdf_parser_spark.plans.session import get_spark  # noqa: E402
from pdf_parser_spark.sources.corpus import read_documents  # noqa: E402

DEFAULT_PARAMS = {
    "hll_p": 12,
    "cms_d": 4,
    "cms_w": 1024,
    "bloom_k": 4,
    "bloom_m": 8192,
}

_TABLES = ("hll_distinct", "word_cms", "fp_bloom", "len_hist")

_MERGE = {
    "hll_distinct": sk.hll_merge,
    "word_cms": sk.cms_merge,
    "fp_bloom": sk.bloom_merge,
    "len_hist": sk.log2_histogram_merge,
}


def _check_params(outdir: Path, params: dict) -> None:
    meta = outdir / "_profile_meta.json"
    if meta.exists():
        stored = json.loads(meta.read_text())
        if stored != params:
            raise ValueError(
                f"profile at {outdir} was built with {stored}; cannot merge "
                f"sketches built with {params} — use a fresh outdir"
            )
    else:
        outdir.mkdir(parents=True, exist_ok=True)
        meta.write_text(json.dumps(params, indent=1, sort_keys=True))


def _read_or_none(spark, path: str, snapshots: bool):
    if snapshots:
        from pdf_parser_spark.sinks import snapshots as sn

        try:
            return sn.read(spark, path)
        except FileNotFoundError:
            return None
    return spark.read.parquet(path) if Path(path).exists() else None


# -------------------------------------------------------- two-phase commit


def _table_batch_id(path: str, snapshots: bool) -> str | None:
    """The batch_id a table last absorbed — the apply-phase idempotence
    key. Underscore-prefixed files inside a parquet directory are
    invisible to Spark readers (Hadoop hidden-file convention)."""
    if snapshots:
        from pdf_parser_spark.sinks import snapshots as sn

        snap = sn.current_snapshot(path)
        return snap["summary"].get("batch_id") if snap else None
    marker = Path(path) / "_batch_id.json"
    if marker.exists():
        return json.loads(marker.read_text())["batch_id"]
    return None


def _swap_plain(spark, df, path: str, batch_id: str) -> None:
    """Overwrite a plain-parquet sketch table. The merged plan READS
    the current table, so the new state is fully materialized to a
    sibling .tmp (with the batch_id marker INSIDE, so one rename
    commits data + idempotence key atomically) before the old
    directory is replaced. _COMMIT_READY seals the tmp: recovery
    finishes a sealed swap and discards an unsealed one."""
    tmp = Path(f"{path}.tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    # sketch tables are bounded at |groups|*m rows by construction —
    # one output file, not shuffle.partitions' worth of tiny tasks
    df.coalesce(1).write.mode("error").parquet(str(tmp))
    (tmp / "_batch_id.json").write_text(json.dumps({"batch_id": batch_id}))
    (tmp / "_COMMIT_READY").write_text("")
    if Path(path).exists():
        shutil.rmtree(path)
    tmp.rename(path)


def _recover_plain_swaps(outdir: Path) -> list[str]:
    """Finish or discard swaps interrupted between materialize and
    rename. A sealed tmp is strictly newer than the directory it was
    about to replace (the writer seals only after the full merged
    state is on disk), so promoting it is always correct."""
    healed = []
    for tmp in sorted(outdir.glob("*.tmp")):
        final = outdir / tmp.name[: -len(".tmp")]
        if (tmp / "_COMMIT_READY").exists():
            if final.exists():
                shutil.rmtree(final)
            tmp.rename(final)
            healed.append(final.name)
        else:
            shutil.rmtree(tmp)
    return healed


def _apply_table(
    spark, staged: str, table: str, merge_fn, batch_id: str, snapshots: bool
) -> None:
    """Merge one staged batch sketch into its table — idempotent: a
    table that already recorded this batch_id is left untouched, so a
    crash between table commits never double-merges the SUM sketches
    on re-apply."""
    if _table_batch_id(table, snapshots) == batch_id:
        return
    batch_df = spark.read.parquet(staged)
    stored = _read_or_none(spark, table, snapshots)
    merged = merge_fn(stored, batch_df) if stored is not None else batch_df
    if snapshots:
        from pdf_parser_spark.sinks import snapshots as sn

        sn.commit(
            spark, merged.coalesce(1), table, operation="overwrite",
            summary={"job": "profile", "batch_id": batch_id},
        )
    else:
        _swap_plain(spark, merged, table, batch_id)


def _apply_seen(spark, staged_urls: str, seen_path: str, batch_id: str, snapshots: bool) -> None:
    """Append the staged batch's urls to the checkpoint. The anti-join
    reads seen_urls as a distinct set, so the worst crash outcome here
    (marker write lost after a plain append) is duplicate url rows —
    benign, unlike a double sketch merge."""
    if _table_batch_id(seen_path, snapshots) == batch_id:
        return
    urls = spark.read.parquet(staged_urls)
    if snapshots:
        from pdf_parser_spark.sinks import snapshots as sn

        sn.commit(
            spark, urls, seen_path, operation="append",
            summary={"job": "profile", "batch_id": batch_id},
        )
    else:
        urls.write.mode("append").parquet(seen_path)
        (Path(seen_path) / "_batch_id.json").write_text(
            json.dumps({"batch_id": batch_id})
        )


def _apply_pending(spark, out: Path, snapshots: bool) -> str | None:
    """Complete a sealed staged batch (idempotent per table), then
    clear staging. Unsealed staging is a crash mid-stage: no sketch
    table saw the batch, so it is safely discarded."""
    staging = out / "_staging"
    if not staging.exists():
        return None
    applied = None
    for batch_dir in sorted(staging.iterdir()):
        ready = batch_dir / "_READY.json"
        if not ready.exists():
            shutil.rmtree(batch_dir)
            continue
        batch_id = json.loads(ready.read_text())["batch_id"]
        for name in _TABLES:
            _apply_table(
                spark, str(batch_dir / name), str(out / name),
                _MERGE[name], batch_id, snapshots,
            )
        _apply_seen(spark, str(batch_dir / "urls"), str(out / "seen_urls"), batch_id, snapshots)
        shutil.rmtree(batch_dir)
        applied = batch_id
    return applied


def build_sketches(base, params: dict) -> dict:
    """The four sketch plans over one projected batch frame with
    columns (url, group, fp, text, n_chars). Caller persists `base`;
    each sketch is one groupBy with a map-side partial, so the batch
    is scanned once from cache."""
    words = base.select(
        "group", F.explode(word_array(F.col("text"))).alias("w")
    ).where(F.col("w") != "")
    return {
        "hll_distinct": sk.hll_register_table(
            base, "group", "fp", p=params["hll_p"]
        ),
        "word_cms": sk.cms_table(
            words, "group", "w", d=params["cms_d"], w=params["cms_w"]
        ),
        "fp_bloom": sk.bloom_table(
            base, "group", "fp", k=params["bloom_k"], m=params["bloom_m"]
        ),
        "len_hist": sk.log2_histogram(base, "group", "n_chars"),
    }


def run(
    input_path: str,
    outdir: str,
    spark=None,
    resume: bool = False,
    snapshots: bool = False,
    params: dict | None = None,
) -> dict:
    from pdf_parser_spark.fsutil import ensure_local_path

    ensure_local_path(outdir, "jobs/corpus_profile.py")
    params = dict(params or DEFAULT_PARAMS)
    _check_params(Path(outdir), params)
    spark = spark or get_spark(app_name="profile")
    t0 = time.perf_counter()
    out = Path(outdir)
    seen_path = str(out / "seen_urls")

    # heal first: interrupted plain swaps, then any sealed pending
    # batch (from its staged frames — the input is not consulted)
    healed = [] if snapshots else _recover_plain_swaps(out)
    recovered = _apply_pending(spark, out, snapshots)

    docs = read_documents(spark, input_path)
    n_input = docs.count()

    seen = _read_or_none(spark, seen_path, snapshots)
    # The anti-join is UNCONDITIONAL whenever seen_urls exists (ADVICE
    # r4): re-running on an existing outdir WITHOUT --resume used to
    # skip it, merging the same documents again under a fresh batch_id
    # and silently double-counting every SUM sketch — the exact
    # corruption the two-phase commit exists to prevent, reachable by
    # plain operator error. The resume flag now only changes intent
    # (incremental continuation vs. accident); dedup safety never
    # depends on it. This also covers the crash-recovery case: a
    # recovered batch's docs are in seen_urls, so its natural
    # re-invocation (same command line) can't merge them twice.
    if seen is not None:
        docs = docs.join(seen.select("url").distinct(), "url", "left_anti")

    # ONE projection of the batch feeds all four sketches; null text
    # profiles as an empty document (fp of "", 0 chars, no words) so
    # every seen url is accounted for in the length histogram
    base = docs.select(
        "url",
        F.coalesce(F.col("lang"), F.lit("und")).alias("group"),
        fingerprint(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
    ).persist()
    try:
        n_new = base.count()
        t_scan = time.perf_counter()

        if n_new > 0:
            batch_id = uuid.uuid4().hex
            batch_dir = out / "_staging" / batch_id
            batch_dir.mkdir(parents=True)
            batch = build_sketches(base, params)
            for name in _TABLES:
                batch[name].coalesce(1).write.mode("error").parquet(
                    str(batch_dir / name)
                )
            base.select("url").coalesce(8).write.mode("error").parquet(
                str(batch_dir / "urls")
            )
            (batch_dir / "_READY.json").write_text(
                json.dumps({"batch_id": batch_id, "tables": list(_TABLES)})
            )
            for name in _TABLES:
                _apply_table(
                    spark, str(batch_dir / name), str(out / name),
                    _MERGE[name], batch_id, snapshots,
                )
            _apply_seen(spark, str(batch_dir / "urls"), seen_path, batch_id, snapshots)
            shutil.rmtree(batch_dir)

        table_rows: dict[str, int] = {}
        for name in _TABLES:
            stored = _read_or_none(spark, str(out / name), snapshots)
            table_rows[name] = stored.count() if stored is not None else 0
        t_sketch = time.perf_counter()

        # headline estimates from the merged state (all bounded reads)
        estimates: dict[str, dict] = {}
        hll = _read_or_none(spark, str(out / "hll_distinct"), snapshots)
        if hll is not None:
            estimates["distinct_fp_est"] = {
                r["group"]: r["est"]
                for r in sk.hll_estimate(hll, p=params["hll_p"]).collect()
            }
        hist = _read_or_none(spark, str(out / "len_hist"), snapshots)
        if hist is not None:
            estimates["p50_chars_est"] = {
                r["group"]: r["estimate"]
                for r in sk.quantile_from_log2_histogram(hist, 0.5).collect()
            }

        return {
            "input_docs": n_input,
            "newly_profiled": n_new,
            "recovered_batch": recovered,
            "healed_swaps": healed,
            "sketch_rows": table_rows,
            "estimates": estimates,
            "wall_sec_scan": round(t_scan - t0, 2),
            "wall_sec_sketch": round(t_sketch - t_scan, 2),
            "wall_sec_total": round(time.perf_counter() - t0, 2),
        }
    finally:
        base.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--snapshots", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()
    spark = get_spark(app_name="profile", cpus=args.cpus)
    result = run(
        args.input,
        args.outdir,
        spark=spark,
        resume=args.resume,
        snapshots=args.snapshots,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
