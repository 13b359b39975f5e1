"""Two-parallelism scaling evidence (north_rule stand-in for N vs 4N
executors).

Runs the identical end-to-end extraction job — parquet scan → salted
repartition → mapInPandas extract → noop sink — in two COLD processes
at local[8] and local[32] over the same on-disk corpus, measures the
steady-state (second) run, and reports throughput at both plus the
scaling efficiency  eff = thr_32 / (4 · thr_8).

Writes BENCH/scaling_last_run.md (BENCH/BASELINE.md is the
hand-consolidated record) and prints one JSON line.

Usage: python tools/scaling_bench.py [n_docs] [low_cores high_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_RUNNER = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from pdf_parser_spark.plans.session import get_spark
from pdf_parser_spark.operators import extract as ox
from pdf_parser_spark.sources.corpus import read_documents

cores = {cores}
spark = get_spark(app_name=f"scale-{{cores}}", cpus=cores)
spark.sparkContext.setLogLevel("ERROR")
docs = read_documents(spark, "{corpus}")

def run():
    t0 = time.perf_counter()
    (ox.extract_documents(ox.salted_repartition(docs, cores * 2))
       .write.format("noop").mode("overwrite").save())
    return time.perf_counter() - t0

warm = run()          # JIT/codegen/python-worker warmup
meas = min(run(), run())
print("RESULT " + json.dumps({{"cores": cores, "warm_s": warm, "sec": meas}}))
"""


def run_at(cores: int, corpus: str, n_docs: int) -> dict:
    code = _RUNNER.format(repo=REPO, cores=cores, corpus=corpus)
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=1200
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["docs_per_sec"] = round(n_docs / r["sec"], 2)
            return r
    raise RuntimeError(f"no RESULT line from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    corpus = f"/tmp/scale_docs_{n_docs}.parquet"

    if not os.path.exists(corpus):
        sys.path.insert(0, str(REPO))
        from pdf_parser_spark.plans.session import get_spark
        from pdf_parser_spark.sources.corpus import synthetic_documents_distributed

        spark = get_spark(app_name="scale-gen")
        t0 = time.perf_counter()
        synthetic_documents_distributed(spark, n_docs, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(corpus)
        print(f"generated {n_docs} docs in {time.perf_counter()-t0:.1f}s -> {corpus}")
        spark.stop()

    r_low = run_at(low, corpus, n_docs)
    r_high = run_at(high, corpus, n_docs)
    ratio = high / low
    eff = (r_high["docs_per_sec"] / r_low["docs_per_sec"]) / ratio
    result = {
        "n_docs": n_docs,
        "low": r_low,
        "high": r_high,
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    # machine-readable sidecar: bench.py folds this into its JSON line
    # so every BENCH_r{N}.json carries the north-rule scaling evidence
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "scaling_last_run.json").write_text(json.dumps(result, indent=2))

    md = REPO / "BENCH" / "scaling_last_run.md"
    md.parent.mkdir(exist_ok=True)
    md.write_text(
        f"""# BENCH baseline — extraction throughput & scaling

End-to-end job: parquet scan -> salted repartition (xxhash64(url, salt))
-> mapInPandas per-document extraction (toc + chunks + validation +
metrics, byte-parity core) -> noop sink. Same corpus, two cold
processes; steady-state (min of runs 2-3) timed, run 1 discarded as
JVM/codegen/python-worker warmup. Sandbox stand-in for N vs 4N
executors per BASELINE.json north_rule.

| config | docs | wall s | docs/sec |
|---|---|---|---|
| local[{low}]  | {n_docs} | {r_low['sec']:.2f} | {r_low['docs_per_sec']} |
| local[{high}] | {n_docs} | {r_high['sec']:.2f} | {r_high['docs_per_sec']} |

**Scaling efficiency ({low} -> {high} cores, x{ratio:.0f}):**
`(thr_high / thr_low) / {ratio:.0f}` = **{eff:.3f}** (target >= 0.8).

Reference single-process baseline (BASELINE.md): 1,047 pages / 227 s
~ 4.6 pages/s ~ 0.004 docs/s on one core for the one committed
1,047-page document. This engine at local[{high}]: {r_high['docs_per_sec']} docs/s on the
synthetic corpus (mixed 5-20 page docs + 1-in-40 mega-docs of 150-400
pages, mega skew defused by the salted repartition).

Regenerate: `python tools/scaling_bench.py {n_docs} {low} {high}`
"""
    )
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
