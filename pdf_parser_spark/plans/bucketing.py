"""Bucketed-table helpers: co-located joins with zero shuffle.

At 100 TB the repeated fact-fact exchange (lineitem ⋈ orders on
orderkey, pages ⋈ bounds on url, signatures ⋈ signatures on band) is
the dominant cost. Writing both sides bucketed on the join key lets
every subsequent join/aggregation on that key run shuffle-free — the
classic Iceberg `bucket(N, key)` partition-spec pattern; here the
Spark catalog's bucketed parquet tables stand in (same planner
behavior: FileScan carries `SelectedBucketsCount`, the join has no
Exchange).

Bucket count guidance: ~2-4× target parallelism, stable across
writes (both sides MUST agree on count and key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, path: str | None = None
) -> None:
    """Persist df as a bucketed+sorted table on `key` (catalog table;
    pass `path` for an external location)."""
    w = df.write.bucketBy(buckets, key).sortBy(key).format("parquet").mode("overwrite")
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the executed plan contains no Exchange (the property
    bucketing buys)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
