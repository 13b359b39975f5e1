"""Lenient JSONL readers (SURVEY §2.1 S3-S5).

The reference streams JSONL and silently skips malformed lines
(orchestrate.py:31-38 iter_jsonl; validate.py:48-58 logs-and-skips).
Spark-first: schema-on-read in PERMISSIVE mode with an explicit
corrupt-record column — bad lines become accountable rows, never a
silent drop (the engine-wide parse-failure policy).

  read_jsonl            schema'd read + `_corrupt` column
  split_corrupt         (good_rows, corrupt_rows) pair
  toc_schema / chunk_schema   the two reference record shapes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CORRUPT_COL = "_corrupt"

TOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_title", T.StringType()),
        T.StructField("section_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("parent_id", T.StringType()),
        T.StructField("full_path", T.StringType()),
    ]
)

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("section_path", T.StringType()),
        T.StructField("start_heading", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("tables", T.ArrayType(T.StringType())),
        T.StructField("figures", T.ArrayType(T.StringType())),
        T.StructField("page_range", T.ArrayType(T.IntegerType())),
    ]
)


def parse_jsonl_column(
    lines: DataFrame, col: str, schema: T.StructType, keep: list[str] | None = None
) -> DataFrame:
    """Lenient schema-on-read over an existing string COLUMN: malformed
    values keep their raw text in `_corrupt` with every data column
    null. The shared core of read_jsonl and of any pipeline whose JSON
    arrives embedded in a table (Kafka values, props columns, q56)."""
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = lines.select(
        *(keep or []),
        F.from_json(
            col,
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("rec"),
    )
    return parsed.select(*(keep or []), "rec.*")


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema'd JSONL read via text + from_json: malformed lines keep
    their raw text in `_corrupt` with every data column null, blank
    lines are dropped. (The PERMISSIVE json reader forbids queries
    that touch only its corrupt column — text+from_json has no such
    restriction and makes the raw line first-class.)"""
    lines = spark.read.text(path).where(F.trim("value") != "")
    return parse_jsonl_column(lines, "value", schema)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without the corrupt column, corrupt raw lines)."""
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def read_toc_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return split_corrupt(read_jsonl(spark, path, TOC_SCHEMA))


def read_chunks_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return split_corrupt(read_jsonl(spark, path, CHUNK_SCHEMA))
