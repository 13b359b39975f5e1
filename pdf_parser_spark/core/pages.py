"""Document text → pages; ToC page-range autodetection (SURVEY §2.1 S1/S2/S6).

The corpus stores pre-extracted page text in the `text` column with
form-feed (\\f) page separators (FIXTURES.md §1) — the engine's analog
of the reference's per-page PDF scan (utils.py:207-230). The ToC range
autodetect mirrors utils.py:119-162: scan the first 30 pages for the
start marker, then up to 12 pages ahead for the list-of-figures/tables
stop marker, defaulting to start+7.
"""

from __future__ import annotations

import re

from .text import normalize_text

PAGE_BREAK = "\f"

TOC_START = re.compile(r"\bTable Of Contents\b", re.IGNORECASE)  # utils.py:80
LIST_STOP = re.compile(r"\bList of (Figures|Tables)\b", re.IGNORECASE)  # utils.py:81

# scan bounds (utils.py:137,148)
_MAX_START_SCAN = 30
_MAX_STOP_LOOKAHEAD = 12
_DEFAULT_SPAN = 7


def split_pages(text: str | None) -> list[tuple[int, str]]:
    """Page-marked text → [(page_no, page_text)], 1-based."""
    if not text:
        return []
    return list(enumerate(text.split(PAGE_BREAK), start=1))


def page_lines(pages: list[tuple[int, str]], start: int, end: int) -> list[str]:
    """All text lines of pages [start, end], clamped. utils.py:171-205."""
    n = len(pages)
    lines: list[str] = []
    for page_no, text in pages[max(1, start) - 1 : min(end, n)]:
        lines.extend(text.splitlines())
    return lines


def autodetect_toc_range(pages: list[tuple[int, str]]) -> tuple[int, int] | None:
    """1-based (start, end) of the ToC block, or None. utils.py:119-162."""
    n = len(pages)
    start: int | None = None
    for i in range(min(n, _MAX_START_SCAN)):
        if TOC_START.search(normalize_text(pages[i][1])):
            start = i + 1
            break
    if start is None:
        return None

    end: int | None = None
    for p in range(start + 1, min(start + _MAX_STOP_LOOKAHEAD, n) + 1):
        if LIST_STOP.search(normalize_text(pages[p - 1][1])):
            end = p - 1
            break
    if end is None:
        end = min(start + _DEFAULT_SPAN, n)
    return start, end
