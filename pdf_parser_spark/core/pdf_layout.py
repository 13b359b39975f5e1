"""PDF layout parse: positioned text blocks → reading-order page text
(SURVEY §2.1 S1, reference utils.py:207-230).

The reference asks PyMuPDF for per-page text BLOCKS
`(x0, y0, x1, y1, text, ...)`, sorts them top-down/left-to-right by
`(y0, x0)`, and joins the non-empty ones with newlines. That layout
logic — the actual "PDF/layout parse" of the north_rule — is
implemented here over a codec-agnostic block representation:

  - `assemble_page(blocks)` reproduces the reference's sort+join
    byte-for-byte given the same blocks;
  - `decode_pdf_pages(data)` is the codec seam: with PyMuPDF
    installed it would yield real blocks per page (same body as the
    reference loop); this container has no PDF codec, so it decodes
    the deterministic FPDF fake container (length-prefixed blocks
    with float coords) and raises NotImplementedError for real PDF
    bytes — the multimodal stub pattern (operators/multimodal.py).
"""

from __future__ import annotations

import struct

MAGIC = b"FPDF"


def assemble_page(blocks: list[tuple[float, float, str]]) -> str:
    """blocks [(x0, y0, text)] → page text in reading order.

    Byte-equal to utils.py:224-225: sort by (y0, x0), join non-blank
    block texts with newlines.
    """
    ordered = sorted(blocks, key=lambda b: (b[1], b[0]))
    return "\n".join(b[2] for b in ordered if b[2].strip())


def encode_fake_pdf(pages: list[list[tuple[float, float, str]]]) -> bytes:
    """Deterministic fake PDF container: per page, blocks of
    (x0:f64, y0:f64, len:u32, utf8 text)."""
    out = [MAGIC, struct.pack(">I", len(pages))]
    for blocks in pages:
        out.append(struct.pack(">I", len(blocks)))
        for x0, y0, text in blocks:
            data = text.encode("utf-8")
            out.append(struct.pack(">ddI", float(x0), float(y0), len(data)))
            out.append(data)
    return b"".join(out)


def decode_pdf_pages(data: bytes) -> list[list[tuple[float, float, str]]]:
    """→ per-page positioned blocks. STUB codec seam: FPDF container
    only; a real deployment swaps in PyMuPDF's page.get_text("blocks")
    here with no change to assemble_page or anything downstream."""
    if data[:4] != MAGIC:
        raise NotImplementedError("real PDF codecs (PyMuPDF/pdfplumber) not available here")
    (n_pages,) = struct.unpack(">I", data[4:8])
    off = 8
    pages: list[list[tuple[float, float, str]]] = []
    for _ in range(n_pages):
        (n_blocks,) = struct.unpack(">I", data[off : off + 4])
        off += 4
        blocks: list[tuple[float, float, str]] = []
        for _ in range(n_blocks):
            x0, y0, ln = struct.unpack(">ddI", data[off : off + 20])
            off += 20
            blocks.append((x0, y0, data[off : off + ln].decode("utf-8")))
            off += ln
        pages.append(blocks)
    return pages


def pdf_to_page_texts(data: bytes) -> list[tuple[int, str]]:
    """Full S1: decode → per-page reading-order assembly → 1-based
    (page_no, text) list (the shape split_pages produces from the
    text column)."""
    return [
        (i, assemble_page(blocks))
        for i, blocks in enumerate(decode_pdf_pages(data), start=1)
    ]
