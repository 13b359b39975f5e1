"""Per-document corpus metrics (SURVEY §2.8 A1-A9).

Semantics recovered from the reference's compiled module
/root/reference/src/reports/__pycache__/metrics.cpython-312.pyc
(source file absent from the tree) plus orchestrate.py helpers:
  - chapter bucketing     ↔ metrics.pyc `_chapter_bucket_from_fields`
  - avg words / tokens    ↔ metrics.pyc `_avg_words`, `_approx_tokens_from_words`
  - table counting        ↔ metrics.pyc `_count_tables_in_chunk`
  - compute_metrics       ↔ metrics.pyc `compute_metrics`
  - maxima_total          ↔ /root/reference/orchestrate.py:137-146
  - count_tables_in_chunk ↔ /root/reference/orchestrate.py:148-154

Spark-native analog: one groupBy(url).agg(...) — countDistinct(chapter),
count(*), sum(size(figures)), sum(table_cnt), avg(words)/1.3, and
conditional sums (operators/metrics_stage.py).
"""

from __future__ import annotations

import re
from collections import defaultdict
from statistics import mean
from typing import Iterable

CHAPTER_HEAD = re.compile(r"^\s*(\d+)\b")
ANY_INT_TOKEN = re.compile(r"\b(\d{1,3})\b")
_TABLE_MENTION = re.compile(r"\bTable\s+\d+(?:\.\d+)?", re.IGNORECASE)  # orchestrate.py:28
_LEADING_INT = re.compile(r"(\d+)")


def avg_words(chunks: list[dict]) -> float:
    """Mean word count over non-empty chunk contents; 0.0 when none."""
    counts = [
        len((c.get("content") or "").split())
        for c in chunks
        if (c.get("content") or "").strip()
    ]
    return mean(counts) if counts else 0.0


def approx_tokens_from_words(words: float) -> int:
    """Words → tokens heuristic, ~1 token per 1.3 words."""
    return int(round(words / 1.3)) if words else 0


def _figure_is_table(fig) -> bool:
    """A figure flagged kind/type == 'table' counts as a table."""
    kind = None
    if isinstance(fig, dict):
        kind = fig.get("kind") or fig.get("type")
    else:
        kind = getattr(fig, "kind", None) or getattr(fig, "type", None)
    return isinstance(kind, str) and kind.lower() == "table"


def count_tables(chunk: dict) -> int:
    """len(tables) + figures flagged as tables."""
    n = len(chunk.get("tables") or [])
    n += sum(1 for f in chunk.get("figures") or [] if _figure_is_table(f))
    return n


def chapter_bucket(section_id: str | None, title: str | None, path: str | None) -> str | None:
    """Leading chapter number with field fallbacks.

    1) leading int of section_id; 2) of title / path; 3) any standalone
    1-3 digit token in title / path.
    """
    for field in (section_id, title, path):
        if field:
            m = CHAPTER_HEAD.match(str(field).strip())
            if m:
                return m.group(1)
    for field in (title, path):
        if field:
            m = ANY_INT_TOKEN.search(str(field))
            if m:
                return m.group(1)
    return None


def compute_metrics(toc: list[dict], chunks: list[dict]) -> dict:
    """High-level per-document metrics over ToC rows + chunk records."""
    toc_chapters = {
        b
        for t in toc
        if (b := chapter_bucket(t.get("section_id"), t.get("title"), t.get("full_path")))
    }
    chunk_chapters = {
        b
        for c in chunks
        if (b := chapter_bucket(c.get("section_id"), c.get("title"), c.get("section_path")))
    }
    no_table = [
        f"{c.get('section_id')} {c.get('title')}".strip()
        for c in chunks
        if count_tables(c) == 0
    ]
    no_diagram = [
        f"{c.get('section_id')} {c.get('title')}".strip()
        for c in chunks
        if not (c.get("figures") or []) and count_tables(c) == 0
    ]
    return {
        "total_chapters": max(len(toc_chapters), len(chunk_chapters)),
        "total_sections": len(toc),
        "total_figures": sum(len(c.get("figures") or []) for c in chunks),
        "total_tables": sum(count_tables(c) for c in chunks),
        "avg_tokens_per_section": approx_tokens_from_words(avg_words(chunks)),
        "sections_without_diagrams": no_diagram,
        "sections_without_tables": no_table,
    }


def maxima_total(ids: Iterable[str]) -> int:
    """Sum over chapters of max trailing int per chapter prefix.

    orchestrate.py:137-146. Spark analog: two-level agg —
    groupBy(chapter).agg(max(tail)) then sum (SURVEY A1).
    """
    best: dict[str, int] = defaultdict(int)
    for s in ids:
        head = s.split(".", 1)[0]
        m = _LEADING_INT.match(s.split(".")[-1])
        if m:
            best[head] = max(best[head], int(m.group(1)))
    return sum(best.values())


def count_tables_in_export(rec: dict) -> int:
    """Table count with export-record fallbacks. orchestrate.py:148-154."""
    if isinstance(rec.get("tables"), list):
        return len(rec["tables"])
    if isinstance(rec.get("tables_count"), int):
        return rec["tables_count"]
    txt = rec.get("content") or rec.get("text") or ""
    return len(_TABLE_MENTION.findall(str(txt)))
