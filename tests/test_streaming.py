"""Structured Streaming extraction: batch/stream parity + checkpointed
incremental processing + watermarked windowed rollup."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_parser_spark.operators import extract as ox
from pdf_parser_spark.sources.corpus import synthetic_documents, write_documents
from pdf_parser_spark.streaming import stream as st


def _drain(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    in_dir = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    in_dir.mkdir()

    docs = synthetic_documents(spark, 20, seed=42)
    write_documents(docs.limit(12), str(in_dir / "batch1"))

    s = st.read_document_stream(spark, str(in_dir / "*"))
    _drain(st.stream_extract(s, out, ckpt, available_now=True))
    got1 = spark.read.parquet(out)
    assert got1.select("url").distinct().count() == 12

    # second file lands; checkpoint makes the next trigger incremental
    write_documents(docs, str(in_dir / "batch2"))
    s = st.read_document_stream(spark, str(in_dir / "*"))
    _drain(st.stream_extract(s, out, ckpt, available_now=True))
    got2 = spark.read.parquet(out)
    assert got2.count() == 12 + 20  # batch2 processed once, batch1 not reprocessed

    # stream output rows equal the batch operator's rows for same input
    batch = ox.extract_documents(docs).select("url", "status", "n_pages")
    stream_rows = {
        (r["url"], r["status"], r["n_pages"])
        for r in got2.select("url", "status", "n_pages").collect()
    }
    for r in batch.collect():
        assert (r["url"], r["status"], r["n_pages"]) in stream_rows


def test_windowed_counts_watermark(spark, tmp_path):
    in_dir = tmp_path / "win_in"
    out = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "win_ckpt")
    in_dir.mkdir()
    write_documents(synthetic_documents(spark, 30, seed=42), str(in_dir / "b1"))

    # synthetic warc_ts spans ~66 min (doc_id * 137 s); a 10-min window
    # with a 1-min watermark closes all but the trailing window
    s = st.read_document_stream(spark, str(in_dir / "*"))
    _drain(
        st.stream_windowed_counts(
            s, out, ckpt, available_now=True, window="10 minutes", watermark="1 minute"
        )
    )
    got = spark.read.parquet(out)
    assert got.count() >= 1
    assert set(got.columns) == {"window_start", "lang", "docs", "text_bytes"}
    assert got.agg({"docs": "sum"}).collect()[0][0] >= 1
