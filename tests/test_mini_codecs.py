"""Vendored pure-Python codecs (VERDICT r2 item 7): real %PDF bytes,
real PNG bytes and a real .xlsx must be produced/consumed IN THIS
container (no PyMuPDF/pdfplumber/PIL/openpyxl installed)."""

from __future__ import annotations

import struct
import sys
import zlib
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_parser_spark.core import minipdf, minipng
from pdf_parser_spark.core import pdf_layout as pl
from pdf_parser_spark.operators.multimodal import _decode_image

# ------------------------------------------------------------------ PDF


PAGES = [
    [(72.0, 100.0, "Chapter 1 Intro"), (72.0, 130.0, "First paragraph.")],
    [(72.0, 90.0, "alpha"), (300.0, 90.0, "beta"), (72.0, 120.0, "gamma")],
    [(50.0, 60.0, "Specials: (parens) and \\backslash\\")],
]


@pytest.mark.parametrize("compress", [False, True])
def test_minipdf_roundtrip_through_codec_seam(compress):
    """encode_pdf → REAL %PDF bytes → decode_pdf_pages (the S1 seam)
    → byte-identical assembled page text, both raw and FlateDecode."""
    data = minipdf.encode_pdf(PAGES, compress=compress)
    assert data[:5] == b"%PDF-" and data.rstrip().endswith(b"%%EOF")
    pages = pl.decode_pdf_pages(data)  # exercises the real-PDF tier
    assert len(pages) == 3
    texts = [pl.assemble_page(b) for b in pages]
    assert texts[0] == "Chapter 1 Intro\nFirst paragraph."
    assert texts[1] == "alpha\nbeta\ngamma"  # (y, x) reading order
    assert texts[2] == "Specials: (parens) and \\backslash\\"
    # block positions survive the round trip (to the writer's 0.01pt)
    got = pages[0]
    assert got[0][:2] == (72.0, 100.0) and got[1][:2] == (72.0, 130.0)


def test_minipdf_ranged_scan_over_real_pdf():
    """S2 pdf_text_lines works over real %PDF bytes, not just FPDF."""
    data = minipdf.encode_pdf(PAGES)
    assert pl.pdf_text_lines(data, 2, 2) == ["alpha", "beta", "gamma"]
    assert pl.pdf_text_lines(data, 1, 1) == ["Chapter 1 Intro", "First paragraph."]


def test_minipdf_handwritten_operators():
    """TJ arrays, hex strings, TL/T*, escapes — a hand-built classic
    PDF using operators our writer doesn't emit."""
    content = (
        b"BT /F1 10 Tf 20 TL 72 700 Td\n"
        b"[(Hel) (lo) ] TJ\n"
        b"T* (second line) Tj\n"
        b"T* <48455821> Tj\n"  # 'HEX!'
        b"ET"
    )
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    pages = minipdf.extract_pdf_blocks(body)
    assert len(pages) == 1
    text = pl.assemble_page(pages[0])
    assert text == "Hello\nsecond line\nHEX!"
    # T* moved down by the 20pt leading each time (top-down y grows)
    ys = [b[1] for b in sorted(pages[0], key=lambda b: (b[1], b[0]))]
    assert ys == [92.0, 112.0, 132.0]


def test_minipdf_multiple_content_streams_and_escapes():
    c1 = b"BT /F1 9 Tf 10 720 Td (part\\tone\\)) Tj ET"
    c2 = b"BT /F1 9 Tf 10 680 Td (line\\nbreak \\101) Tj ET"  # \101 -> 'A'
    objs = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents [4 0 R 5 0 R] >>"
    )
    for c in (c1, c2):
        objs.append(
            b"<< /Length " + str(len(c)).encode() + b" >>\nstream\n" + c + b"\nendstream"
        )
    body = b"%PDF-1.4\n" + b"".join(
        f"{i} 0 obj\n".encode() + o + b"\nendobj\n" for i, o in enumerate(objs, 1)
    ) + b"%%EOF\n"
    pages = minipdf.extract_pdf_blocks(body)
    text = pl.assemble_page(pages[0])
    assert text == "part\tone)\nline\nbreak A"


def test_minipdf_out_of_scope_reasons():
    with pytest.raises(ValueError, match="not a %PDF"):
        minipdf.extract_pdf_blocks(b"GIF89a")
    with pytest.raises(ValueError, match="no indirect objects"):
        minipdf.extract_pdf_blocks(b"%PDF-1.7\nnot really a pdf")
    enc = b"%PDF-1.7\n1 0 obj\n<< /Encrypt 9 0 R >>\nendobj\n"
    with pytest.raises(ValueError, match="encrypted"):
        minipdf.extract_pdf_blocks(enc)
    flt = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 4 /Filter /LZWDecode >>\nstream\nabcd\nendstream\nendobj\n"
    )
    with pytest.raises(ValueError, match="unsupported stream filter"):
        minipdf.extract_pdf_blocks(flt)


def test_minipdf_page_tree_order_and_mediabox_inheritance():
    """Kids order (not object-number order) dictates pages; /MediaBox
    inherited from the Pages node flips y correctly."""
    c_a = b"BT 10 10 Td (second) Tj ET"
    c_b = b"BT 10 10 Td (first) Tj ET"
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        # 400pt-tall pages, declared ONLY on the tree node
        b"2 0 obj\n<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 /MediaBox [0 0 300 400] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(c_a)).encode() + b" >>\nstream\n" + c_a + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n"
        b"6 0 obj\n<< /Length " + str(len(c_b)).encode() + b" >>\nstream\n" + c_b + b"\nendstream\nendobj\n"
    )
    texts = minipdf.extract_pdf_page_texts(body)
    assert [t for _, t in texts] == ["first", "second"]
    pages = minipdf.extract_pdf_blocks(body)
    assert pages[0][0][1] == 390.0  # 400 - 10: inherited MediaBox height


# ------------------------------------------------------------------ PNG


def test_minipng_gray_roundtrip_through_image_seam():
    px = bytes(range(12))
    data = minipng.encode_png_gray(4, 3, px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, out = _decode_image(data)  # the multimodal codec seam
    assert (w, h, out) == (4, 3, px)


def test_minipng_rgb_luma_matches_pil_formula():
    # hand-built 2x1 RGB PNG, filter 0
    w, h = 2, 1
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"\x00" + bytes([255, 0, 0, 0, 255, 0])  # red, green
    data = (
        b"\x89PNG\r\n\x1a\n"
        + minipng._chunk(b"IHDR", ihdr)
        + minipng._chunk(b"IDAT", zlib.compress(raw))
        + minipng._chunk(b"IEND", b"")
    )
    _, _, out = minipng.decode_png(data)
    # PIL's exact fixed-point convert('L'): (R*19595+G*38470+B*7471+0x8000)>>16
    assert out == bytes(
        [(255 * 19595 + 0x8000) >> 16, (255 * 38470 + 0x8000) >> 16]
    )


def test_minipng_luma_rounds_half_up_like_pil():
    """r=149 pure red: floor(//1000) gives 44, PIL rounds to 45 —
    the boundary case the r3 advice flagged; plus a PIL cross-check
    for every pure level when PIL is installed."""
    def rgb_png(*pixels):
        w = len(pixels)
        ihdr = struct.pack(">IIBBBBB", w, 1, 8, 2, 0, 0, 0)
        raw = b"\x00" + b"".join(bytes(p) for p in pixels)
        return (
            b"\x89PNG\r\n\x1a\n"
            + minipng._chunk(b"IHDR", ihdr)
            + minipng._chunk(b"IDAT", zlib.compress(raw))
            + minipng._chunk(b"IEND", b"")
        )

    _, _, out = minipng.decode_png(rgb_png((149, 0, 0)))
    assert out[0] == 45  # (149*19595+0x8000)>>16 — floor//1000 gave 44

    try:
        from PIL import Image
    except ImportError:
        return  # fixed-point expression above IS PIL's, verified where installed
    import io

    levels = [(v, 0, 0) for v in range(256)] + [(0, v, 0) for v in range(256)]
    data = rgb_png(*levels)
    pil = Image.open(io.BytesIO(data)).convert("L").tobytes()
    _, _, ours = minipng.decode_png(data)
    assert ours == pil


def test_minipng_row_filters_sub_up_average_paeth():
    """Craft filtered rows by applying each filter's forward transform
    to known pixels, then assert the decoder inverts them exactly."""
    w, h = 4, 4
    rows = [
        bytes([10, 20, 30, 40]),
        bytes([15, 25, 35, 45]),
        bytes([100, 90, 80, 70]),
        bytes([1, 2, 3, 4]),
    ]
    # forward-filter: row0 Sub, row1 Up, row2 Average, row3 Paeth
    f0 = bytes([rows[0][0]] + [(rows[0][i] - rows[0][i - 1]) & 0xFF for i in range(1, w)])
    f1 = bytes([(rows[1][i] - rows[0][i]) & 0xFF for i in range(w)])
    f2 = bytes(
        [
            (rows[2][i] - (((rows[2][i - 1] if i else 0) + rows[1][i]) >> 1)) & 0xFF
            for i in range(w)
        ]
    )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    f3 = bytes(
        [
            (
                rows[3][i]
                - paeth(
                    rows[3][i - 1] if i else 0,
                    rows[2][i],
                    rows[2][i - 1] if i else 0,
                )
            )
            & 0xFF
            for i in range(w)
        ]
    )
    raw = b"\x01" + f0 + b"\x02" + f1 + b"\x03" + f2 + b"\x04" + f3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + minipng._chunk(b"IHDR", ihdr)
        + minipng._chunk(b"IDAT", zlib.compress(raw))
        + minipng._chunk(b"IEND", b"")
    )
    _, _, out = minipng.decode_png(data)
    assert out == b"".join(rows)


def test_minipng_out_of_scope_reasons():
    with pytest.raises(ValueError, match="not a PNG"):
        minipng.decode_png(b"JFIF")
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    data = b"\x89PNG\r\n\x1a\n" + minipng._chunk(b"IHDR", ihdr16)
    with pytest.raises(ValueError, match="bit depth"):
        minipng.decode_png(data)
    ihdr_pal = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = b"\x89PNG\r\n\x1a\n" + minipng._chunk(b"IHDR", ihdr_pal)
    with pytest.raises(ValueError, match="color type"):
        minipng.decode_png(data)


# ----------------------------------------------------------------- XLSX


def test_minixlsx_readback_values(tmp_path):
    import xml.etree.ElementTree as ET
    import zipfile

    from pdf_parser_spark.sinks.minixlsx import write_xlsx

    target = str(tmp_path / "wb.xlsx")
    write_xlsx(
        {
            "metrics": (
                ["name", "count", "ratio", "flag"],
                [("alpha", 3, 0.5, True), ("be<ta>&", 4, 1.25, False)],
            ),
            "empty": (["col"], []),
        },
        target,
    )
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(target) as z:
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = sheet.findall(".//m:row", ns)
        assert len(rows) == 3  # header + 2 data rows

        def cellvals(row):
            out = []
            for c in row.findall("m:c", ns):
                if c.get("t") == "inlineStr":
                    out.append(c.find("m:is/m:t", ns).text)
                else:
                    out.append(c.find("m:v", ns).text)
            return out

        assert cellvals(rows[0]) == ["name", "count", "ratio", "flag"]
        assert cellvals(rows[1]) == ["alpha", "3", "0.5", "1"]
        assert cellvals(rows[2]) == ["be<ta>&", "4", "1.25", "0"]
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.findall(".//m:sheet", ns)]
        assert names == ["metrics", "empty"]


def test_minipdf_stream_bytes_containing_markers_do_not_corrupt():
    """Stream payloads legally contain ANY bytes — including 'endobj'
    and 'N M obj'. The /Length-driven sequential scan must neither
    truncate the stream nor let a spurious in-stream object header
    clobber a real object."""
    # payload contains both poison markers; declared via /Length
    poison = b"AAAA\nendobj\n3 0 obj\n<< /Type /Page >>\nBBBB"
    content = b"BT /F1 9 Tf 10 700 Td (survived) Tj ET"
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(poison)).encode() + b" >>\nstream\n"
        + poison + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
    )
    # object 3 (the real Page) must survive the poison in object 4,
    # and object 5 must still be discovered after it
    objs = minipdf._load_objects(body)
    assert set(objs) == {1, 2, 3, 4, 5}
    assert minipdf._obj_dict(objs[3][0]).get("Contents").num == 4
    assert objs[4][1] == poison
    assert objs[5][1] == content
    # end-to-end: the page decodes through the poisoned sibling
    body2 = body.replace(b"/Contents 4 0 R", b"/Contents 5 0 R")
    texts = minipdf.extract_pdf_page_texts(body2)
    assert texts == [(1, "survived")]


# ------------------------------------------------------------------ JPEG

from pdf_parser_spark.core import minijpeg  # noqa: E402


def test_minijpeg_roundtrip_near_lossless():
    """Gradient + structured 24x16 gray image through encode->decode:
    flat quant=1 is near-lossless (float DCT rounding only)."""
    w, h = 24, 16
    px = bytes(((x * 7 + y * 11) % 251 for y in range(h) for x in range(w)))
    data = minijpeg.encode_jpeg_gray(w, h, px, quant=1)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dw, dh, out = minijpeg.decode_jpeg(data)
    assert (dw, dh) == (w, h)
    err = max(abs(a - b) for a, b in zip(px, out))
    assert err <= 2, f"max pixel error {err}"


def test_minijpeg_solid_and_nonmultiple_of_8():
    # 10x5 (needs edge padding + crop), solid value survives exactly
    w, h = 10, 5
    px = bytes([137] * (w * h))
    dw, dh, out = minijpeg.decode_jpeg(minijpeg.encode_jpeg_gray(w, h, px, quant=2))
    assert (dw, dh) == (w, h)
    assert max(abs(137 - v) for v in out) <= 1


def test_minijpeg_decode_through_image_seam():
    """multimodal._decode_image routes raw JPEG bytes to minijpeg when
    PIL is absent (and PIL agrees within the spec's IDCT variance when
    installed)."""
    w, h = 16, 8
    px = bytes(((x * 16 + y * 3) % 256 for y in range(h) for x in range(w)))
    data = minijpeg.encode_jpeg_gray(w, h, px, quant=1)
    dw, dh, out = _decode_image(data)
    assert (dw, dh) == (w, h)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 2

    try:
        from PIL import Image
    except ImportError:
        return
    import io

    pil = Image.open(io.BytesIO(data)).convert("L").tobytes()
    assert max(abs(a - b) for a, b in zip(pil, out)) <= 2


def test_minijpeg_rejects_progressive_and_garbage():
    import pytest

    w, h = 8, 8
    data = bytearray(minijpeg.encode_jpeg_gray(w, h, bytes(64), quant=2))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF0"):
        minijpeg.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        minijpeg.decode_jpeg(b"not a jpeg")


def test_minijpeg_ycbcr_420_and_444_decode():
    """Exercises the decoder's 3-component path: MCU interleave, per-
    component DC predictors, chroma upsampling. Solid colors avoid
    subsampling edge artifacts; expected gray = PIL luma of the RGB."""
    def luma(r, g, b):
        return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16

    for subsample in (True, False):
        for color in [(200, 30, 60), (10, 250, 10), (128, 128, 128)]:
            w, h = 20, 12  # non-multiple of the 16px (4:2:0) MCU
            rgb = bytes(color) * (w * h)
            data = minijpeg.encode_jpeg_rgb(w, h, rgb, quant=2, subsample=subsample)
            dw, dh, out = minijpeg.decode_jpeg(data)
            assert (dw, dh) == (w, h)
            want = luma(*color)
            err = max(abs(v - want) for v in out)
            assert err <= 3, f"{color} subsample={subsample}: err {err}"


def test_minijpeg_420_blockwise_image():
    """Two-tone image with 16px-aligned regions (no chroma bleed):
    each half decodes to its own luma."""
    def luma(r, g, b):
        return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16

    w, h = 32, 16
    left, right = (220, 40, 40), (40, 40, 220)
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            rgb += bytes(left if x < 16 else right)
    data = minijpeg.encode_jpeg_rgb(w, h, bytes(rgb), quant=2)
    _, _, out = minijpeg.decode_jpeg(data)
    # sample away from the 16px boundary (DCT ringing lives there)
    for y in (2, 8, 13):
        assert abs(out[y * w + 4] - luma(*left)) <= 4
        assert abs(out[y * w + 27] - luma(*right)) <= 4


def test_minijpeg_restart_markers_fuzz():
    """DRI/RSTn handling (r4 review finding: ~half of restart JPEGs
    failed when the RST was still unscanned at the boundary): sweep
    widths x intervals so boundaries land at every buffer phase."""
    import random

    rng = random.Random(5)
    for w in (8, 16, 24, 40, 56):
        for interval in (1, 2, 3, 5):
            h = 16
            px = bytes(rng.randrange(256) for _ in range(w * h))
            data = minijpeg.encode_jpeg_gray(w, h, px, quant=1, restart_interval=interval)
            assert b"\xff\xdd" in data  # DRI present
            dw, dh, out = minijpeg.decode_jpeg(data)
            assert (dw, dh) == (w, h)
            err = max(abs(a - b) for a, b in zip(px, out))
            assert err <= 2, f"w={w} interval={interval}: err {err}"


def test_minijpeg_multiscan_raises_not_corrupts():
    """A non-interleaved multi-scan baseline file must raise, never
    return silently-corrupt pixels (zero chroma, scrambled Y)."""
    import pytest

    data = bytearray(minijpeg.encode_jpeg_rgb(16, 16, bytes([90, 120, 200]) * 256, quant=2))
    # rewrite the interleaved SOS (3 components) into a Y-only scan
    i = data.find(b"\xff\xda")
    assert i > 0
    y_only_sos = bytes([0xFF, 0xDA, 0x00, 0x08, 1, 1, 0x00, 0, 63, 0])
    data = bytes(data[:i]) + y_only_sos + bytes(data[i + 12 :])
    with pytest.raises(ValueError, match="multi-scan"):
        minijpeg.decode_jpeg(data)


# ------------------------------------------------------------------ AVI (MJPEG)

from pdf_parser_spark.core import miniavi  # noqa: E402


def _gradient_frames(w, h, n):
    return [
        bytes(((x * 9 + y * 5 + 17 * f) % 251 for y in range(h) for x in range(w)))
        for f in range(n)
    ]


def test_miniavi_roundtrip_real_mjpeg():
    w, h, n = 16, 8, 3
    frames = _gradient_frames(w, h, n)
    data = miniavi.encode_mjpeg_avi(w, h, frames, fps=10, quant=1)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    pw, ph, jpegs = miniavi.parse_avi(data)
    assert (pw, ph, len(jpegs)) == (w, h, n)
    for f_no in range(n):
        dw, dh, px = miniavi.decode_frame(jpegs, f_no)
        assert (dw, dh) == (w, h)
        err = max(abs(a - b) for a, b in zip(frames[f_no], px))
        assert err <= 2, f"frame {f_no}: err {err}"


def test_miniavi_rejects_non_avi_and_empty():
    import pytest

    with pytest.raises(ValueError, match="RIFF/AVI"):
        miniavi.parse_avi(b"not an avi")
    # valid RIFF with no dc frames
    empty = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    with pytest.raises(ValueError, match="frames"):
        miniavi.parse_avi(empty)


def test_miniavi_through_video_operators(spark):
    """The video seam end-to-end on REAL bytes: media_metadata reads
    dimensions/frame-count from the AVI header, sample_frames decodes
    every Nth JPEG frame to grayscale via minijpeg."""
    from pdf_parser_spark.operators import multimodal as mm
    from pdf_parser_spark.operators.multimodal import media_metadata, sample_frames

    w, h, n = 16, 8, 6
    frames = _gradient_frames(w, h, n)
    avi = miniavi.encode_mjpeg_avi(w, h, frames, quant=1)
    df = spark.createDataFrame(
        [("v1", "video", avi, "video/x-msvideo")], schema=mm.MEDIA_SCHEMA
    )

    meta = media_metadata(df).collect()[0]
    assert meta["status"] == "ok"
    assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, n)

    got = {r["frame_no"]: r for r in sample_frames(df, every_n=2).collect()}
    assert sorted(got) == [0, 2, 4]
    for f_no, r in got.items():
        assert (r["width"], r["height"]) == (w, h)
        err = max(abs(a - b) for a, b in zip(frames[f_no], bytes(r["frame"])))
        assert err <= 2


def test_minixlsx_header_style_and_autofit(tmp_path):
    """K5 parity polish (VERDICT r4 #7): row 1 carries the bold cell
    format (s="1" → cellXfs/fontId 1 with <b/>), data rows don't, and
    every column has the reference _autofit width
    min(longest value + 2, 60)."""
    import xml.etree.ElementTree as ET
    import zipfile

    from pdf_parser_spark.sinks.minixlsx import write_xlsx

    target = str(tmp_path / "wb.xlsx")
    long_val = "x" * 100
    write_xlsx(
        {"s": (["name", "n"], [("alpha", 3), (long_val, 4)])},
        target,
    )
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(target) as z:
        assert "xl/styles.xml" in z.namelist()
        styles = ET.fromstring(z.read("xl/styles.xml"))
        fonts = styles.findall(".//m:fonts/m:font", ns)
        assert fonts[1].find("m:b", ns) is not None  # font 1 is bold
        xfs = styles.findall(".//m:cellXfs/m:xf", ns)
        assert xfs[1].get("fontId") == "1"
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = sheet.findall(".//m:row", ns)
        assert all(c.get("s") == "1" for c in rows[0].findall("m:c", ns))
        assert all(c.get("s") is None for c in rows[1].findall("m:c", ns))
        cols = sheet.findall(".//m:cols/m:col", ns)
        # col 1: longest is the 100-char value → capped at 60;
        # col 2: longest is "name"-column header... no, header "name"
        # (4) vs values alpha(5)/x*100 — col1 header "name"(4), values
        # 5 and 100 → 60 cap; col2 header "n"(1), values 3,4 (len 1) → 3
        assert cols[0].get("width") == "60"
        assert cols[1].get("width") == "3"
        # the styles part is wired into content types + workbook rels
        assert "/xl/styles.xml" in z.read("[Content_Types].xml").decode()
        assert "styles.xml" in z.read("xl/_rels/workbook.xml.rels").decode()


def test_write_spreadsheet_permission_fallback(tmp_path, monkeypatch):
    """Reference orchestrate.py:382-393: a PermissionError writing the
    target (file open in Excel) falls back to a timestamped
    ValidationReport_*.xlsx next to it instead of failing the job."""
    import re

    from pdf_parser_spark.sinks import reports as rp

    calls = {"n": 0}
    real = rp._write_frames_xlsx

    def locked_once(frames, target, max_width=60):
        calls["n"] += 1
        if calls["n"] == 1:
            raise PermissionError(13, "locked", target)
        return real(frames, target, max_width)

    monkeypatch.setattr(rp, "_write_frames_xlsx", locked_once)
    import pandas as pd

    frames = {"s": pd.DataFrame({"a": [1, 2]})}
    target = tmp_path / "report.xlsx"

    class FakeDF:
        def limit(self, n):
            return self

        def toPandas(self):
            return frames["s"]

    written = rp.write_spreadsheet({"s": FakeDF()}, str(target))
    assert len(written) == 1 and written[0] != str(target)
    name = Path(written[0]).name
    assert re.fullmatch(r"ValidationReport_\d{8}_\d{6}\.xlsx", name), name
    assert Path(written[0]).exists()
    assert calls["n"] == 2
