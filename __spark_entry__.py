"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship native ToC pipeline (parse → parent
repair → appendix-aware ordering) over the sf0.001 documents table.
`queries()` / `oracle_sql()` expose the full suite from
pdf_parser_spark/queries/suite.py: one entry per operator family in
SURVEY.md §2 plus the training-data tier (dedup / similarity / text
analysis / webtext hygiene / sample shaping). Every queries() key has
a full DuckDB value oracle — the xxhash64 twins DuckDB cannot replay
live in suite.BENCH_QUERIES (timed by bench.py, value-checked via
their portable-hash twins), NOT in the driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pdf_parser_spark.queries import ORACLES, SPARK_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK_QUERIES["q15_toc_parent_repair"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same parquet tables)."""
    return dict(ORACLES)
