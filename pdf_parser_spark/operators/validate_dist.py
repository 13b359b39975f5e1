"""Distributed ToC↔chunk validation over DataFrame inputs (J1-J5, W7).

The one-pass extractor already validates inside its per-document UDF;
this operator covers the other real workflow — toc and chunks arrive
as TABLES (from Iceberg/parquet sinks, possibly produced by different
jobs) and must be matched at corpus scale:

    toc(url, doc_title, section_id, title, page, level, parent_id,
        full_path)
  ⨝ chunks(url, section_path, start_heading, content, tables,
        figures, page_range)
  → validation(url, toc_section_count, parsed_section_count,
        missing/extra/out_of_order/matched_sections)

Implementation: cogroup(url).applyInPandas running the byte-parity
core matcher — the greedy stateful fuzzy phase (validate.py:297-324)
consumes chunks in ToC order, so it MUST stay sequential within a
url (SURVEY §7 hard-part (b)); across urls it is embarrassingly
parallel. One shuffle per side, both hashed on url, Arrow-batched.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, types as T

from ..core import matching

VALIDATION_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("toc_section_count", T.IntegerType()),
        T.StructField("parsed_section_count", T.IntegerType()),
        T.StructField("missing_sections", T.ArrayType(T.StringType())),
        T.StructField("extra_sections", T.ArrayType(T.StringType())),
        T.StructField("out_of_order_sections", T.ArrayType(T.StringType())),
        T.StructField("matched_sections", T.ArrayType(T.StringType())),
    ]
)


def validate_distributed(
    toc: DataFrame,
    chunks: DataFrame,
    fuzzy_threshold: float = 0.90,
    prefer_section_id: bool = True,
) -> DataFrame:
    """Per-url ValidationReport rows from toc/chunks tables."""

    def match(key, toc_pdf: pd.DataFrame, chunks_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        (url,) = key
        # the greedy matcher is ORDER-SENSITIVE (ToC rows consume
        # chunks; out-of-order compares chunk indices) and a shuffled
        # group arrives in nondeterministic row order — when the caller
        # ships an explicit position column, restore it before matching
        if "toc_pos" in toc_pdf.columns:
            toc_pdf = toc_pdf.sort_values("toc_pos", kind="mergesort").drop(columns=["toc_pos"])
        if "chunk_pos" in chunks_pdf.columns:
            chunks_pdf = chunks_pdf.sort_values("chunk_pos", kind="mergesort").drop(
                columns=["chunk_pos"]
            )

        def records(pdf: pd.DataFrame) -> list[dict]:
            # Arrow materializes array columns as np.ndarray; the core
            # expects plain lists (truthiness, slicing semantics)
            return [
                {k: (v.tolist() if isinstance(v, np.ndarray) else v) for k, v in r.items()}
                for r in pdf.to_dict("records")
            ]

        toc_records = matching.load_toc_records(records(toc_pdf))
        chunk_records = [matching.coerce_chunk_record(r) for r in records(chunks_pdf)]
        report = matching.validation_report(
            toc_records,
            chunk_records,
            fuzzy_threshold=fuzzy_threshold,
            prefer_section_id=prefer_section_id,
        )
        return pd.DataFrame([{"url": url, **report}])

    return (
        toc.groupBy("url")
        .cogroup(chunks.groupBy("url"))
        .applyInPandas(match, schema=VALIDATION_SCHEMA)
    )
