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


def test_stateful_first_seen_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps one row per distinct text across
    micro-batches; re-crawled duplicates only bump state."""
    from pyspark.sql import Row
    from pdf_parser_spark.streaming import stateful as sf
    import pdf_parser_spark.sources.corpus as corpus

    in_dir = tmp_path / "dd_in"
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    in_dir.mkdir()

    def write(batch_name, rows):
        df = spark.createDataFrame(rows, schema="url string, text string")
        df = df.selectExpr(
            "url", "cast(null as timestamp) warc_ts", "cast(null as binary) html",
            "text", "cast(null as string) lang",
        )
        df.write.parquet(str(in_dir / batch_name))

    write("b1", [Row(url="u1", text="alpha beta"), Row(url="u2", text="gamma delta"),
                 Row(url="u3", text="ALPHA   beta")])  # normalizes equal to u1
    s = st.read_document_stream(spark, str(in_dir / "*"))
    q = sf.run_first_seen(s, out, ckpt, available_now=True)
    _drain(q)
    got1 = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert set(got1) == {"u1", "u2"}          # u3 deduped within batch, min-url keeper
    assert got1["u1"]["dupes_so_far"] == 2

    # batch 2: re-crawl of alpha + one new text → only the new one emits
    write("b2", [Row(url="u4", text="alpha beta"), Row(url="u5", text="epsilon zeta")])
    s = st.read_document_stream(spark, str(in_dir / "*"))
    _drain(sf.run_first_seen(s, out, ckpt, available_now=True))
    got2 = spark.read.parquet(out)
    assert got2.count() == 3
    assert got2.where("url = 'u5'").count() == 1
    assert got2.where("url = 'u4'").count() == 0  # cross-batch duplicate suppressed


def test_windowed_quality_rollup_matches_batch(spark, tmp_path):
    """Stream/batch parity of the corpus-hygiene rollup: the streaming
    watermarked agg over the full (drained) corpus must equal the same
    expressions run as a batch agg."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.operators.webtext_filters import gopher_quality_flags, pii_redact
    from pdf_parser_spark.sources.corpus import synthetic_documents, write_documents
    from pdf_parser_spark.streaming.stream import read_document_stream, windowed_quality_rollup

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_documents(synthetic_documents(spark, 40, seed=42), src)

    agg = windowed_quality_rollup(
        read_document_stream(spark, src), window="10 minutes", watermark="1 minute"
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(out)
    batch = (
        pii_redact(gopher_quality_flags(spark.read.parquet(src)))
        .groupBy(F.window(F.col("warc_ts").cast("timestamp"), "10 minutes").alias("w"), "lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.col("gopher_keep").cast("bigint")).alias("n_keep"),
            F.sum(
                (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")).cast("bigint")
            ).alias("n_pii"),
        )
        .select(F.col("w.start").alias("window_start"), "lang", "docs", "n_keep", "n_pii")
    )
    got = {
        (r["window_start"], r["lang"]): (r["docs"], r["n_keep"], r["n_pii"])
        for r in streamed.collect()
    }
    want = {
        (r["window_start"], r["lang"]): (r["docs"], r["n_keep"], r["n_pii"])
        for r in batch.collect()
    }
    # append mode withholds windows the final watermark hasn't passed:
    # everything emitted must match batch exactly, and all but the
    # trailing watermark-held windows must have been emitted
    assert len(got) > 0
    assert all(got[k] == want[k] for k in got)
    held = set(want) - set(got)
    if held:
        last_start = max(k[0] for k in want)
        assert all((last_start - k[0]).total_seconds() <= 660 for k in held)
