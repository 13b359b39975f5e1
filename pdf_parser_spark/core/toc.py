"""ToC line parsing, hierarchy repair, ordering (SURVEY §2.5 E1, §2.6 W1-W3).

Byte-identical to the reference ToC stage:
  - TOC line grammar + parse loop   ↔ /root/reference/src/toc.py:17-22,149-209
  - section sort key                ↔ /root/reference/src/toc.py:49-62
  - synthetic parent insertion      ↔ /root/reference/src/toc.py:65-95
  - title/line preprocessing        ↔ /root/reference/src/toc.py:121-147

Entries are plain dicts (Arrow-friendly) with the reference row schema:
doc_title, section_id, title, page, level, parent_id, full_path.

The reference validates rows with pydantic (page>=1, level>=1,
models.py:14-15) and its public wrapper swallows any failure into an
empty list for the whole document (toc.py:223-234) — replicated here:
a page of 0 anywhere nukes the document's ToC, by design.
"""

from __future__ import annotations

import re
from typing import Iterable

from .text import normalize_text, strip_dot_leaders

# leader glyph class used inside ToC lines (toc.py:15)
_LEADERS = "\\.\u00B7\u2022\u2024\u2026"

# <section-id>  <title>  [leaders]  <page>   (toc.py:17-22)
TOC_LINE = re.compile(
    r"^\s*(?P<section>(?:\d+(?:\.\d+)*|[A-Z](?:\.\d+)*))\s+"
    r"(?P<title>.+?)\s*"
    r"(?:[" + _LEADERS + r"\s]{2,})?"
    r"(?P<page>\d{1,5})\s*$"
)

# numeric/letter prefix stripping inside titles (toc.py:24)
_NUM_PREFIXED_TITLE = re.compile(r"^\s*(?:\d+|[A-Z])(?:[.\-]\d+)*\s+(?P<title>.+?)\s*$")
# spaced leader runs (toc.py:25)
_LEADER_SPLIT = re.compile(r"(?:\s*[" + _LEADERS + r"]\s*){3,}")
# OCR noise: six-plus isolated letters (toc.py:26)
_ISOLATED_LETTERS = re.compile(r"(?:\b[A-Za-z]\b[.\s]*){6,}")
_SPACE_RUN = re.compile(r"\s{2,}")

# section-id → (title, page) overrides for known-broken ToC rows
# (toc.py:40-42); kept verbatim for output parity
SECTION_OVERRIDES: dict[str, tuple[str, int]] = {
    "10": ("Power Rules", 995),
}

_TOC_HEADER_PREFIXES = ("table of contents", "list of figures", "list of tables")


class TocRowError(ValueError):
    """Row failed the reference's model validation (page/level >= 1)."""


def is_appendix(section_id: str) -> bool:
    """Section ids starting with a letter are appendices. toc.py:44-46."""
    return bool(section_id) and section_id[0].isalpha()


def section_sort_key(section_id: str) -> tuple[int, ...]:
    """Numeric sections before appendices; tuple-wise numeric order.

    toc.py:49-62. "1.2" -> (0,1,2);  "A.1" -> (1,1,1).
    """
    parts = section_id.split(".")
    if is_appendix(section_id):
        head = (ord(parts[0]) - ord("A") + 1,)
        tail = tuple(int(p) for p in parts[1:] if p.isdigit())
        return (1, *head, *tail)
    return (0, *(int(p) for p in parts if p.isdigit()))


def _clean_title(raw_title: str) -> str:
    """Drop leaders / numeric prefix / space runs from a title. toc.py:121-129."""
    t = strip_dot_leaders(raw_title or "")
    t = _LEADER_SPLIT.split(t)[0].strip()
    m = _NUM_PREFIXED_TITLE.match(t)
    if m:
        t = m.group("title").strip()
    return _SPACE_RUN.sub(" ", t).strip()


def _preprocess_line(s: str, strip_dots: bool) -> str:
    """Normalize + de-noise one raw ToC line. toc.py:131-138."""
    s = normalize_text(s)
    s = _ISOLATED_LETTERS.sub("", s)
    s = _SPACE_RUN.sub(" ", s).strip()
    if strip_dots:
        s = strip_dot_leaders(s)
    return s.strip()


def _is_content_line(s: str) -> bool:
    """Reject 'Table of Contents' / 'List of ...' header rows. toc.py:140-143."""
    return not s.lower().startswith(_TOC_HEADER_PREFIXES)


def _wanted(section_id: str, min_dots: int) -> bool:
    """Appendices always pass; numeric ids need >= min_dots dots. toc.py:145-147."""
    return is_appendix(section_id) or section_id.count(".") >= min_dots


def _make_entry(doc_title: str, section_id: str, title: str, page: int) -> dict:
    """One ToC row dict with derived parent/level/path + model validation."""
    if page < 1:
        raise TocRowError(f"page must be >= 1, got {page}")
    level = section_id.count(".") + 1
    if level < 1:  # unreachable; mirrors models.py:15
        raise TocRowError("level must be >= 1")
    return {
        "doc_title": doc_title,
        "section_id": section_id,
        "title": title,
        "page": page,
        "level": level,
        "parent_id": section_id.rsplit(".", 1)[0] if "." in section_id else None,
        "full_path": f"{section_id} {title}",
    }


def repair_parents(entries: list[dict], doc_title: str) -> list[dict]:
    """Insert synthetic ancestors with min(page) over descendants.

    toc.py:65-95. For child "2.3.1" without "2.3", append
    {section_id: "2.3", title: "Section 2.3", page: min child page}.
    Spark-native equivalent: explode(ancestors) → groupBy min(page) →
    anti-join existing ids → union (operators/toc_stage.py).
    """
    present = {e["section_id"] for e in entries}
    earliest: dict[str, int] = {}
    for e in entries:
        sid = e["section_id"]
        while "." in sid:
            sid = sid.rsplit(".", 1)[0]
            earliest[sid] = min(earliest.get(sid, e["page"]), e["page"])

    for pid, page in earliest.items():
        if pid in present:
            continue
        entry = _make_entry(doc_title, pid, f"Section {pid}", page)
        entries.append(entry)
    return entries


def parse_toc_lines(
    lines: Iterable[str],
    doc_title: str,
    min_dots: int = 0,
    strip_dots: bool = False,
) -> list[dict]:
    """Raw ToC text lines → ordered ToC row dicts. toc.py:149-209.

    Returns [] when any row fails validation, matching the reference's
    catch-all wrapper (toc.py:223-234).
    """
    try:
        entries: list[dict] = []
        for raw in lines:
            s = _preprocess_line(raw, strip_dots)
            if not s or not _is_content_line(s):
                continue
            m = TOC_LINE.match(s)
            if not m:
                continue
            section_id = m.group("section").strip()
            if not _wanted(section_id, min_dots):
                continue
            if section_id in SECTION_OVERRIDES:
                raw_title, page = SECTION_OVERRIDES[section_id]
            else:
                raw_title = m.group("title").strip()
                page = int(m.group("page"))
            entries.append(_make_entry(doc_title, section_id, _clean_title(raw_title), page))

        entries = repair_parents(entries, doc_title)
        entries.sort(key=lambda e: (section_sort_key(e["section_id"]), e["page"]))
        return entries
    except Exception:
        return []
