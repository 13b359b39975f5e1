"""PDF layout parse: positioned text blocks → reading-order page text
(SURVEY §2.1 S1, reference utils.py:207-230).

The reference asks PyMuPDF for per-page text BLOCKS
`(x0, y0, x1, y1, text, ...)`, sorts them top-down/left-to-right by
`(y0, x0)`, and joins the non-empty ones with newlines. That layout
logic — the actual "PDF/layout parse" of the north_rule — is
implemented here over a codec-agnostic block representation:

  - `assemble_page(blocks)` reproduces the reference's sort+join
    byte-for-byte given the same blocks;
  - `decode_pdf_pages(data)` is the codec seam: PyMuPDF blocks when
    installed (same body as the reference loop), else pdfplumber,
    else the vendored pure-Python `minipdf` reader (classic xref +
    FlateDecode subset, stdlib-only) — so real %PDF bytes decode in
    THIS container too. The deterministic FPDF fake container remains
    the golden-test path (length-prefixed blocks with float coords).
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


def _decode_real_pdf(data: bytes) -> list[list[tuple[float, float, str]]]:
    """Real-PDF body, three tiers: PyMuPDF blocks first (reference
    utils.py:207-230 — b[0]=x0, b[1]=y0, b[4]=text), else pdfplumber
    per-page text as one block per line (the reference's pdfplumber
    path, utils.py:171-205, is line-oriented — y0=line index preserves
    reading order through assemble_page), else the vendored pure-Python
    minipdf reader (stdlib zlib; classic/FlateDecode subset) so real
    %PDF bytes decode even in codec-less containers like this one.
    minipdf raises ValueError with a reason for its documented
    out-of-scope cases (encryption, /ObjStm, non-Flate filters)."""
    import io

    try:
        import fitz  # PyMuPDF

        pages: list[list[tuple[float, float, str]]] = []
        with fitz.open(stream=data, filetype="pdf") as doc:
            for page in doc:
                pages.append([(b[0], b[1], b[4]) for b in page.get_text("blocks")])
        return pages
    except ImportError:
        pass
    try:
        import pdfplumber

        pages = []
        with pdfplumber.open(io.BytesIO(data)) as pdf:
            for page in pdf.pages:
                txt = page.extract_text() or ""
                pages.append(
                    [(0.0, float(i), line) for i, line in enumerate(txt.splitlines())]
                )
        return pages
    except ImportError:
        from .minipdf import extract_pdf_blocks

        return extract_pdf_blocks(data)


def decode_pdf_pages(data: bytes) -> list[list[tuple[float, float, str]]]:
    """→ per-page positioned blocks. FPDF fake container decodes
    natively (deterministic test path); real %PDF bytes go through
    PyMuPDF/pdfplumber when installed, else the vendored minipdf
    reader; non-PDF containers raise."""
    if data[:4] != MAGIC:
        if data[:5] == b"%PDF-":
            return _decode_real_pdf(data)
        raise NotImplementedError("unrecognized container (not FPDF, not %PDF)")
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


def pdf_text_lines(data: bytes, start: int, end: int) -> list[str]:
    """S2 ranged scan at the codec level (reference utils.py:171-205):
    text lines of pages start..end inclusive, 1-based, clamped to the
    document. Works over any container decode_pdf_pages accepts."""
    pages = pdf_to_page_texts(data)
    start, end = max(1, start), min(end, len(pages))
    out: list[str] = []
    for page_no, text in pages:
        if start <= page_no <= end:
            out.extend(text.splitlines())
    return out


def pdf_to_page_texts(data: bytes) -> list[tuple[int, str]]:
    """Full S1: decode → per-page reading-order assembly → 1-based
    (page_no, text) list (the shape split_pages produces from the
    text column)."""
    return [
        (i, assemble_page(blocks))
        for i, blocks in enumerate(decode_pdf_pages(data), start=1)
    ]
