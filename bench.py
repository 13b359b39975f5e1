"""Round benchmark: headline queries + extraction throughput.

Runs the suite's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
end-to-end per-document extraction pipeline on a deterministic
synthetic corpus, and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extra": {...}}

Full materialization is forced with the noop sink (no collect, no
disk) so timings measure the plan, not the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pdf_parser_spark.plans.session import get_spark  # noqa: E402
from pdf_parser_spark.queries.suite import SPARK_QUERIES  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_nation_revenue",
    "q04_bulk_parts_semi",
    "q05_customers_without_orders",
    "q08_top_orders_per_customer",
    "q09_event_gaps",
    "q12_event_hourly",
    "q14_toc_parse",
    "q15_toc_parent_repair",
    "q16_toc_sort_rank",
    "q17_chunk_bounds",
    "q18_chunk_page_gather",
    "q19_heading_extract",
    "q20_caption_lists",
    "q21_validation_counts",
    "q25_exact_duplicates",
    "q26_blocked_jaccard_pairs",
    "q27_text_features",
    "q28_quality_summary",
    "q29_word_topk",
    "q30_cosine_topk",
    "q31_centroids",
    "q32_embedding_near_dups",
    "q33_minhash_lsh_pairs",
    "q34_simhash_near_dups",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000"))
    spark = get_spark(app_name="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: pay JVM/codegen/Arrow/python-worker startup once, untimed,
    # so per-query timings measure the plans rather than first-run JIT
    _force(SPARK_QUERIES["q01_pricing_summary"](spark, sf_dir))
    _force(SPARK_QUERIES["q14_toc_parse"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(SPARK_QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # end-to-end extraction pipeline (the BASELINE.json north metric is
    # docs/sec): distributed synth corpus → parquet → salted repartition
    # → mapInPandas extract → noop sink; one untimed pass first so the
    # python-UDF worker spin-up isn't billed to the steady-state number
    from pdf_parser_spark.operators import extract as ox
    from pdf_parser_spark.sources.corpus import (
        read_documents,
        synthetic_documents_distributed,
    )

    corpus_path = f"/tmp/bench_docs_{n_docs}.parquet"
    if not os.path.exists(corpus_path):
        synthetic_documents_distributed(spark, n_docs, seed=42, partitions=cpus * 2).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    docs = read_documents(spark, corpus_path)
    _force(ox.extract_documents(ox.salted_repartition(docs, cpus * 2)))  # warmup
    extract_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _force(ox.extract_documents(ox.salted_repartition(docs, cpus * 2)))
        extract_sec = min(extract_sec, time.perf_counter() - t0)
    timings["extract_pipeline"] = round(extract_sec, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_plus_extraction_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extra": {
                    "cpus": cpus,
                    "extract_docs": n_docs,
                    "extract_docs_per_sec": round(n_docs / extract_sec, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
