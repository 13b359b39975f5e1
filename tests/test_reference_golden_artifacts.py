"""Parity against the reference's OWN committed artifacts.

/root/reference/data/output holds the outputs of the one real run the
reference repo ships (299 ToC entries, 299 chunks of the 1,047-page
USB-PD spec, log invariant `PDF_Parser.log:26`: 299 matched, 0
missing, 0 extra, 0 out-of-order). Feeding those artifacts through
OUR load/coerce/match/metrics stages must reproduce the reference's
recorded results exactly — real-data parity, not synthetic.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_parser_spark.core import doc_metrics, matching

TOC_PATH = Path("/root/reference/data/output/usb_pd_toc.jsonl")
CHUNKS_PATH = Path("/root/reference/data/output/usb_pd_spec.jsonl")

pytestmark = pytest.mark.skipif(
    not TOC_PATH.exists(), reason="reference golden artifacts unavailable"
)


def _load_jsonl(path: Path) -> list[dict]:
    return [json.loads(l) for l in path.read_text().splitlines() if l.strip()]


@pytest.fixture(scope="module")
def golden():
    toc = matching.load_toc_records(_load_jsonl(TOC_PATH))
    chunks = [matching.coerce_chunk_record(r) for r in _load_jsonl(CHUNKS_PATH)]
    return toc, chunks


def test_matcher_reproduces_logged_invariant(golden):
    """Our matcher over the reference's real outputs = the run log:
    299/299 matched, 0 missing, 0 extra, 0 out-of-order."""
    toc, chunks = golden
    report = matching.validation_report(toc, chunks, fuzzy_threshold=0.90, prefer_section_id=True)
    assert report["toc_section_count"] == 299
    assert report["parsed_section_count"] == 299
    assert report["missing_sections"] == []
    assert report["extra_sections"] == []
    assert report["out_of_order_sections"] == []
    assert len(report["matched_sections"]) == 299


def test_metrics_on_reference_artifacts(golden):
    """compute_metrics over the real corpus: caption counts match the
    committed data (1,042 table + 1,152 figure caption strings)."""
    toc, chunks = golden
    m = doc_metrics.compute_metrics(toc, chunks)
    assert m["total_sections"] == 299
    assert m["total_figures"] == sum(len(c["figures"]) for c in chunks) == 1152
    assert m["total_tables"] >= 1000  # count_tables coalesces list len
    assert m["avg_tokens_per_section"] > 0


def test_distributed_validator_on_reference_artifacts(spark, golden):
    """The cogrouped table-level validator reproduces the same report
    when the artifacts arrive as Spark tables."""
    from pyspark.sql import Row

    from pdf_parser_spark.operators.validate_dist import validate_distributed

    toc_rows = [Row(url="usb_pd", **r) for r in _load_jsonl(TOC_PATH)]
    chunk_raw = _load_jsonl(CHUNKS_PATH)
    chunk_rows = [
        Row(
            url="usb_pd",
            section_path=r.get("section_path"),
            start_heading=r.get("start_heading"),
            content=r.get("content"),
            tables=[str(x) for x in r.get("tables") or []],
            figures=[str(x) for x in r.get("figures") or []],
            page_range=[int(x) for x in r.get("page_range") or []],
        )
        for r in chunk_raw
    ]
    toc_df = spark.createDataFrame(toc_rows)
    chunks_df = spark.createDataFrame(chunk_rows)
    out = validate_distributed(toc_df, chunks_df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["toc_section_count"] == 299
    assert len(r["matched_sections"]) == 299
    assert list(r["missing_sections"]) == []
    assert list(r["extra_sections"]) == []
    assert list(r["out_of_order_sections"]) == []
