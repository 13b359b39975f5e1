"""Vendored minimal MJPEG-in-AVI codec — closes the video seam.

The reference has no media pipeline at all; this exists so
operators/multimodal's video path (header probe + frame sampling) has
a REAL in-container body, the way minipng/minijpeg do for images. An
MJPEG AVI is the simplest real video container: a RIFF tree whose
'movi' list holds one complete JPEG per frame ('00dc' chunks) —
exactly what webcams and older capture pipelines emit, and decodable
here because core/minijpeg already handles baseline JPEG.

  parse_avi(data)   -> (width, height, [jpeg_bytes per frame])
  decode_frame(...) -> grayscale pixels via minijpeg (PIL parity path)
  encode_mjpeg_avi(width, height, gray_frames, fps) -> real AVI bytes
      (avih + strl headers, movi 00dc chunks, even-byte padding) for
      round-trip tests and fixtures.

Out of scope (ValueError with a reason): non-MJPEG streams (no '00dc'
JPEG payloads), OpenDML index tricks (frames are read from the movi
list directly, so 'idx1' is optional on both sides).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator


def _chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_start, body_size) for each RIFF chunk in
    [pos, end); chunk bodies are padded to even length."""
    while pos + 8 <= end:
        cc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            return  # truncated tail: expose what fits, never raise here
        yield cc, body, size
        pos = body + size + (size & 1)


def parse_avi(data: bytes) -> tuple[int, int, list[bytes]]:
    """→ (width, height, [jpeg frame bytes]). Walks the RIFF tree for
    'avih' (dimensions) and every '00dc'/'01dc' movi chunk that starts
    with a JPEG SOI. Frame count = frames actually present (trusted
    over the avih header, which lies in the wild)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("miniavi: not a RIFF/AVI container")
    width = height = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height
        for cc, body, size in _chunks(data, pos, end):
            if cc == b"LIST":
                walk(body + 4, body + size)  # skip the list-type fourcc
            elif cc == b"avih" and size >= 40:
                width, height = struct.unpack("<II", data[body + 32 : body + 40])
            elif cc[2:4] == b"dc" and data[body : body + 2] == b"\xff\xd8":
                frames.append(data[body : body + size])

    walk(12, len(data))
    if not frames:
        raise ValueError("miniavi: no MJPEG ('..dc' JPEG) frames found")
    return width, height, frames


def decode_frame(frames: list[bytes], frame_no: int) -> tuple[int, int, bytes]:
    """Grayscale pixels of one frame via the vendored JPEG decoder."""
    from .minijpeg import decode_jpeg

    return decode_jpeg(frames[frame_no])


def encode_mjpeg_avi(
    width: int, height: int, gray_frames: list[bytes], fps: int = 25, quant: int = 2
) -> bytes:
    """Minimal spec-shaped MJPEG AVI from grayscale frames (each
    width*height bytes): avih + one video strl, movi list of 00dc
    JPEG chunks. Plays in standard tools; round-trips through
    parse_avi/decode_frame."""
    from .minijpeg import encode_jpeg_gray

    jpegs = [encode_jpeg_gray(width, height, f, quant=quant) for f in gray_frames]

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(jpegs)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1), 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
