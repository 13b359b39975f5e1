"""S1 PDF layout parse: block sort parity + fake-container round-trip
feeding the full extraction pipeline."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_parser_spark.core import pdf_layout as pl
from pdf_parser_spark.core.pipeline import extract_document


def test_assemble_page_matches_reference_sort():
    """Same (y0, x0) ordering + non-blank join as utils.py:224-225 —
    out-of-order columns and blank blocks included."""
    blocks = [
        (300.0, 100.0, "right column"),
        (50.0, 100.0, "left column"),
        (10.0, 50.0, "header line"),
        (10.0, 400.0, "  "),          # blank → dropped
        (10.0, 200.0, "body para"),
        (10.0, 100.0, "mid-left first"),
    ]
    assert pl.assemble_page(blocks) == (
        "header line\nmid-left first\nleft column\nright column\nbody para"
    )
    # y ties break by x (reference tuple sort)
    assert pl.assemble_page([(5.0, 1.0, "b"), (1.0, 1.0, "a")]) == "a\nb"


def test_fake_container_roundtrip_to_pipeline():
    pages = [
        [(10.0, 20.0, "Title Page")],
        [(0.0, 0.0, "Table Of Contents"), (0.0, 10.0, "1 Introduction ..... 4")],
        [(0.0, 0.0, "List of Figures")],
        [(0.0, 0.0, "1 Introduction"), (0.0, 5.0, "Body words here.")],
    ]
    data = pl.encode_fake_pdf(pages)
    got = pl.pdf_to_page_texts(data)
    assert [p for p, _ in got] == [1, 2, 3, 4]
    assert got[1][1] == "Table Of Contents\n1 Introduction ..... 4"

    # S1 output feeds the standard pipeline (page list form → \f text)
    text = "\f".join(t for _, t in got)
    result = extract_document(text, doc_title="fake-pdf")
    assert result["status"] == "ok"
    assert [e["section_id"] for e in result["toc"]] == ["1"]


def test_real_pdf_bytes_route_to_real_codec_tier():
    # real %PDF bytes go to PyMuPDF/pdfplumber/minipdf — malformed
    # bodies error (here: minipdf's no-objects reason), never silence
    with pytest.raises(Exception):
        pl.decode_pdf_pages(b"%PDF-1.7 real bytes")
