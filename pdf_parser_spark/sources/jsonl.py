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


def coerce_chunks_column(
    df: DataFrame, col: str = "value", keep: list[str] | None = None
) -> DataFrame:
    """Legacy/export chunk-record coercion over a raw-JSON string
    column, DISTRIBUTED (SURVEY S5/E7; reference validate.py:204-258).

    Each value is parsed and run through the byte-parity core
    `coerce_chunk_record`: modern records (pydantic-shaped — string
    page_range, dict captions) pass through; export records split
    `start_heading`/`section_path` on the first space, stringify the
    two-element page_range list, and re-extract caption ids with the
    validator grammar (`Table 3-2. Foo` → `3-2`). Runs as one
    Arrow-batched mapInPandas — per-row Python is unavoidable here
    because the coercion IS reference Python semantics (dict-shape
    dispatch + regex grammar), but batches amortize transfer and the
    operator is embarrassingly parallel (no shuffle, no state).

    Upstream corrupt-line handling belongs to parse_jsonl_column /
    read_jsonl (PERMISSIVE + `_corrupt`): this operator assumes every
    value is well-formed JSON, the same contract the reference's
    iter_jsonl-then-coerce pipeline gives its coercion loop.
    """
    keep = list(keep or [])
    out_schema = T.StructType(
        [df.schema[k] for k in keep]
        + [
            T.StructField("section_path", T.StringType()),
            T.StructField("section_id", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("page_range", T.StringType()),
            T.StructField("content", T.StringType()),
            T.StructField("tables", T.ArrayType(T.StringType())),
            T.StructField("figures", T.ArrayType(T.StringType())),
        ]
    )
    names = [f.name for f in out_schema.fields]

    def coerce_batches(batches):
        import json

        import pandas as pd

        from pdf_parser_spark.core import matching

        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                obj = json.loads(getattr(row, col))
                c = matching.coerce_chunk_record(obj)
                rec = {k: getattr(row, k) for k in keep}
                rec.update(c)
                recs.append(rec)
            yield pd.DataFrame(recs, columns=names)

    return df.mapInPandas(coerce_batches, out_schema)
