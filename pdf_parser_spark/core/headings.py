"""Heading detection over page lines (SURVEY §2.5 E2-E3, §2.3 F4-F5).

Byte-identical to the reference detector:
  - heading grammar           ↔ /root/reference/src/chunk.py:34-36
  - noise rejection           ↔ /root/reference/src/chunk.py:134-152
  - per-line extraction       ↔ /root/reference/src/chunk.py:154-173
  - page sweep                ↔ /root/reference/src/chunk.py:175-191

Reference quirk preserved: the final plausibility check passes the
*title* as both num and title (chunk.py:152 `looks_like_heading(num=title,
title=title)`), so a heading whose title is literally "0" is rejected by
the num=="0" rule, not its section number.
"""

from __future__ import annotations

import re

from .text import (
    clean_heading_title,
    is_running_header,
    looks_like_heading,
    normalize_text,
)

# numbered or appendix-lettered heading line (chunk.py:34-36)
HEADING_LINE = re.compile(
    r"^\s*(?P<num>(?:\d+(?:\.\d+)*|[A-Z](?:\.\d+)*))\s+(?P<title>.+?)\s*$"
)

# noise patterns any of which disqualifies a heading (chunk.py:134-139)
_NOISE = (
    re.compile(r"[.·•]{3,}"),                      # punct runs, chunk.py:22
    re.compile(r"(?:\b[A-Za-z]\b[.\s]*){6,}"),               # isolated letters, chunk.py:23
    re.compile(r"P\s*a\s*g\s*e\s*\d+", re.IGNORECASE),       # noisy page no, chunk.py:24
    re.compile(                                               # brand line, chunk.py:30-32
        r"Universal Serial Bus Power Delivery Specification", re.IGNORECASE
    ),
)
_HAS_ALPHA = re.compile(r"[A-Za-z]")


def heading_is_noisy(line: str, title: str) -> bool:
    """True when either the raw line or title trips a noise rule.

    chunk.py:144-152.
    """
    if any(pat.search(title) or pat.search(line) for pat in _NOISE):
        return True
    if is_running_header(title):
        return True
    if not _HAS_ALPHA.search(title):
        return True
    return not looks_like_heading(num=title, title=title)


def extract_heading(
    line: str,
    toc_ids: set[str] | None = None,
    toc_map: dict[str, str] | None = None,
) -> tuple[str, str] | None:
    """Parse one line into (section_id, title) or None. chunk.py:154-173.

    `toc_ids` gates detections to known ids (Spark analog: broadcast
    semi-join, SURVEY J7); `toc_map` overrides titles (broadcast left
    join + coalesce, SURVEY J8).
    """
    s = normalize_text(line)
    m = HEADING_LINE.match(s)
    if not m:
        return None
    num, raw_title = m.group("num"), m.group("title").strip()
    title = clean_heading_title(raw_title)

    if heading_is_noisy(s, title):
        return None
    if toc_ids and num not in toc_ids:
        return None
    if toc_map and num in toc_map:
        title = toc_map[num]
    return num, title


def detect_headings(
    pages: list[tuple[int, str]],
    toc_ids: set[str] | None = None,
    skip_pages: set[int] | None = None,
    toc_map: dict[str, str] | None = None,
) -> list[tuple[int, str, str]]:
    """Sweep pages → [(page_no, section_id, title)]. chunk.py:175-191."""
    skip_pages = skip_pages or set()
    found: list[tuple[int, str, str]] = []
    for page_no, text in pages:
        if page_no in skip_pages:
            continue
        for line in (text or "").splitlines():
            hit = extract_heading(line, toc_ids, toc_map)
            if hit:
                found.append((page_no, *hit))
    return found
