"""Corpus IO: documents-table schema, synth→DataFrame, parquet round-trip.

The documents table follows BASELINE.json input_hint exactly:
(url string, warc_ts timestamp, html binary, text string, lang string).
In production this is an Iceberg table partitioned by bucket(N, url)
or days(warc_ts); here parquet stands in (same reader API surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from .synth import generate_corpus

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), nullable=False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def synthetic_documents(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic in-memory documents DataFrame (tests/bench)."""
    rows = [
        (d["url"], d["warc_ts"], d["html"], d["text"], d["lang"])
        for d in generate_corpus(n_docs, seed=seed)
    ]
    df = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    return df.repartition(partitions) if partitions else df


def write_documents(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)
