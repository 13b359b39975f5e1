"""pdf_parser_spark — a PySpark-native extraction/analytics engine.

From-scratch re-expression of the capabilities of avinash21107/PDF_Parser
(reference at /root/reference, read-only) as an idiomatic Spark DataFrame
pipeline over a corpus of Common-Crawl-style pages
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Layout
------
core/       pure-Python, Spark-free document logic (runs inside pandas UDFs);
            reference-faithful to the byte (each function cites file:line).
sources/    corpus readers/writers (parquet/JSONL), schemas, page explode.
operators/  Spark DataFrame stages: toc, chunk, validate, metrics, dedup,
            similarity, text analysis, multimodal plumbing.
functions/  reusable Spark column expressions (native, codegen-friendly).
plans/      SparkSession factory + tuned configs (AQE, Arrow, shuffle).
streaming/  Structured Streaming variant of the extraction pipeline.
jobs/       spark-submit entry points (checkpoint/resume, lineage metrics).
"""

__version__ = "0.1.0"
