"""Deterministic fake media payloads for the multimodal pipeline.

The container ships no image/audio codecs (no PIL/ffmpeg), so the
multimodal operators decode a documented FAKE container format; these
generators produce those payloads deterministically. The byte layouts
are trivial length-prefixed headers — enough to exercise real binary
parsing, error paths and batch shapes without a codec.

Formats (big-endian u32 fields after the magic):
  image  b"FIMG" + width + height + payload (width*height bytes, seeded)
  audio  b"FAUD" + sample_rate + n_samples + payload (n_samples bytes)
  video  b"FVID" + width + height + n_frames, then per frame:
         frame payload of width*height bytes
"""

from __future__ import annotations

import random
import struct


def fake_image(width: int, height: int, seed: int = 0) -> bytes:
    rng = random.Random((seed << 16) ^ width ^ (height << 8))
    payload = bytes(rng.randrange(256) for _ in range(min(width * height, 4096)))
    payload = (payload * ((width * height) // max(len(payload), 1) + 1))[: width * height]
    return b"FIMG" + struct.pack(">II", width, height) + payload


def fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    rng = random.Random((seed << 16) ^ sample_rate ^ n_samples)
    payload = bytes(rng.randrange(256) for _ in range(min(n_samples, 4096)))
    payload = (payload * (n_samples // max(len(payload), 1) + 1))[:n_samples]
    return b"FAUD" + struct.pack(">II", sample_rate, n_samples) + payload


def fake_video(width: int, height: int, n_frames: int, seed: int = 0) -> bytes:
    head = b"FVID" + struct.pack(">III", width, height, n_frames)
    frames = []
    for f in range(n_frames):
        rng = random.Random((seed << 20) ^ f)
        frame = bytes(rng.randrange(256) for _ in range(min(width * height, 1024)))
        frame = (frame * ((width * height) // max(len(frame), 1) + 1))[: width * height]
        frames.append(frame)
    return head + b"".join(frames)


def media_rows(n: int, seed: int = 42) -> list[dict]:
    """n deterministic rows across the three kinds + a corrupt row mix."""
    rows = []
    for i in range(n):
        rng = random.Random((seed << 24) ^ i)
        kind = ("image", "audio", "video", "image")[i % 4]
        url = f"https://media{i % 7}.example/m/{i}"
        if rng.random() < 0.06:  # corrupt payload → decode-failure path
            rows.append({"url": url, "kind": kind, "media": b"\x00garbage", "mime": "application/octet-stream"})
            continue
        if kind == "image":
            w, h = rng.choice([(64, 48), (128, 96), (320, 240)])
            rows.append({"url": url, "kind": kind, "media": fake_image(w, h, i), "mime": "image/fake"})
        elif kind == "audio":
            sr = rng.choice([8000, 16000])
            ns = rng.randrange(1000, 8000)
            rows.append({"url": url, "kind": kind, "media": fake_audio(sr, ns, i), "mime": "audio/fake"})
        else:
            w, h = 32, 24
            nf = rng.randrange(4, 24)
            rows.append({"url": url, "kind": kind, "media": fake_video(w, h, nf, i), "mime": "video/fake"})
    return rows
