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

`--snapshots` commits each sketch table through the snapshot-manifest
layer (sinks/snapshots.py): every profiling run is one atomic,
time-travelable overwrite commit per table — `read(spark, tbl, i)`
gives the corpus statistics as of batch i. Plain mode swaps via a tmp
directory rename (crash between remove and rename can lose the table;
the snapshot mode is the atomic one).

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


def _write_state(spark, df, path: str, snapshots: bool, summary: dict) -> None:
    """Overwrite-commit the merged sketch state. Snapshot mode is
    atomic (manifest CAS). Plain mode materializes to a tmp sibling
    first — the merged plan READS the current table, so an in-place
    overwrite would corrupt its own input."""
    if snapshots:
        from pdf_parser_spark.sinks import snapshots as sn

        sn.commit(spark, df, path, operation="overwrite", summary=summary)
        return
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("error").parquet(tmp)
    if Path(path).exists():
        shutil.rmtree(path)
    Path(tmp).rename(path)


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

    docs = read_documents(spark, input_path)
    n_input = docs.count()

    seen = _read_or_none(spark, seen_path, snapshots)
    if resume and seen is not None:
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

        table_rows: dict[str, int] = {}
        if n_new > 0:
            batch = build_sketches(base, params)
            for name in _TABLES:
                stored = _read_or_none(spark, str(out / name), snapshots)
                merged = (
                    _MERGE[name](stored, batch[name])
                    if stored is not None
                    else batch[name]
                )
                _write_state(
                    spark,
                    merged,
                    str(out / name),
                    snapshots,
                    summary={"job": "profile", "batch_urls": n_new},
                )
                table_rows[name] = _read_or_none(
                    spark, str(out / name), snapshots
                ).count()
            if snapshots:
                from pdf_parser_spark.sinks import snapshots as sn

                sn.commit(
                    spark,
                    base.select("url"),
                    seen_path,
                    operation="append",
                    summary={"job": "profile"},
                )
            else:
                base.select("url").write.mode("append").parquet(seen_path)
        else:
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

        result = {
            "input_docs": n_input,
            "newly_profiled": n_new,
            "sketch_rows": table_rows,
            "estimates": estimates,
            "wall_sec_scan": round(t_scan - t0, 2),
            "wall_sec_sketch": round(t_sketch - t_scan, 2),
            "wall_sec_total": round(time.perf_counter() - t0, 2),
        }
        return result
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
