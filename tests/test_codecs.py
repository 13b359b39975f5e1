"""Import-gated real codec bodies (VERDICT r1 item 7): WAV via stdlib
wave (runs everywhere), PIL / PyMuPDF / pdfplumber paths exercised
where installed and skipped (not stubbed) where absent, plus the
failure contracts for real bytes with no codec."""

from __future__ import annotations

import io
import struct
import sys
import wave
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_parser_spark.core import pdf_layout as pl
from pdf_parser_spark.logger import get_logger
from pdf_parser_spark.operators.multimodal import _decode_audio, _decode_image


def _wav_bytes(sr: int, samples: bytes) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sr)
        w.writeframes(samples)
    return buf.getvalue()


def test_wav_decodes_via_stdlib_wave():
    pcm = bytes(range(100))
    sr, ns, out = _decode_audio(_wav_bytes(8000, pcm))
    assert (sr, ns, out) == (8000, 100, pcm)


def test_faud_container_still_decodes():
    data = b"FAUD" + struct.pack(">II", 44100, 4) + b"\x01\x02\x03\x04"
    assert _decode_audio(data) == (44100, 4, b"\x01\x02\x03\x04")


def test_unknown_audio_container_raises():
    with pytest.raises(NotImplementedError):
        _decode_audio(b"OggS garbage")


def test_truncated_png_surfaces_decode_error():
    # PIL or minipng, a truncated PNG must surface a decode error (the
    # operator layer maps it to status=decode_error), not hang
    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    with pytest.raises(Exception):
        _decode_image(png_magic)


def test_real_unsupported_image_without_pil_raises():
    # JPEG bytes now get a REAL decode attempt (core/minijpeg — r4):
    # truncated data is a ValueError from the codec, not a
    # NotImplementedError from a missing seam
    jpeg_magic = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    with pytest.raises((ValueError, OSError)):
        _decode_image(jpeg_magic)
    # formats with no vendored decoder (GIF) still raise the seam error
    gif_magic = b"GIF89a" + b"\x00" * 16
    try:
        import PIL  # noqa: F401

        with pytest.raises(Exception):
            _decode_image(gif_magic)
    except ImportError:
        with pytest.raises(NotImplementedError):
            _decode_image(gif_magic)


def test_pil_roundtrip_if_installed():
    PIL = pytest.importorskip("PIL")  # noqa: N806
    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (4, 3), color=7).save(buf, format="PNG")
    w, h, px = _decode_image(buf.getvalue())
    assert (w, h) == (4, 3) and px == bytes([7]) * 12


def test_malformed_real_pdf_surfaces_error():
    # every tier (PyMuPDF / pdfplumber / vendored minipdf) must turn a
    # malformed %PDF body into an error, never silent empty output
    fake_real_pdf = b"%PDF-1.7\nnot really a pdf"
    with pytest.raises(Exception):
        pl.decode_pdf_pages(fake_real_pdf)


def test_pymupdf_blocks_if_installed():
    fitz = pytest.importorskip("fitz")
    doc = fitz.open()
    page = doc.new_page()
    page.insert_text((72, 72), "hello spark")
    data = doc.tobytes()
    pages = pl.decode_pdf_pages(data)
    assert len(pages) == 1
    assert any("hello spark" in b[2] for b in pages[0])


def test_pdf_text_lines_ranged_over_fpdf():
    data = pl.encode_fake_pdf(
        [
            [(0.0, 0.0, "page one line")],
            [(0.0, 0.0, "alpha"), (0.0, 1.0, "beta")],
            [(0.0, 0.0, "page three")],
        ]
    )
    assert pl.pdf_text_lines(data, 2, 2) == ["alpha", "beta"]
    # clamped: start<1 and end>n fold to the document
    assert pl.pdf_text_lines(data, 0, 99) == [
        "page one line", "alpha", "beta", "page three",
    ]


def test_unrecognized_pdf_container_raises():
    with pytest.raises(NotImplementedError, match="unrecognized"):
        pl.decode_pdf_pages(b"ZIPX whatever")


def test_logger_factory_idempotent(tmp_path):
    lg = get_logger("pps.test", log_dir=str(tmp_path))
    lg2 = get_logger("pps.test", log_dir=str(tmp_path))
    assert lg is lg2
    assert len(lg.handlers) == 2  # console + file (driver side)
    lg.info("hello file")
    for h in lg.handlers:
        h.flush()
    assert "hello file" in (tmp_path / "pdf_parser_spark.log").read_text()
    assert lg.propagate is False
