"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates rows with the BASELINE.json input_hint schema:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

`text` is spec-shaped page text with \\f page breaks — a Table Of
Contents block, numbered/appendix heading lines on the promised pages,
figure/table caption lines, and every noise family the reference's
normalizers handle (ligatures, NBSP variants, unicode dashes, dot
leaders, de-spaced captions, running headers, Page-N footers,
hyphen-wrapped line breaks, bullets, camelCase joins).

`html` wraps the same pages in boilerplate-laden markup (nav/header/
footer/aside/script) for the DOM-heuristic extraction path; the main
content region reproduces `text` exactly after entity escaping, so
html→text extraction has a byte-identity oracle.

Everything is seeded — same (n_docs, seed) → same corpus, no
wall-clock, no external data.
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import random

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

_TITLES = [
    "Introduction",
    "Overview",
    "Power Rules",
    "Cable Assemblies",
    "USB Type-C Connectors",
    "Data Link Layer",
    "Protocol Layer Messaging",
    "State Machines",
    "Electrical Parameters",
    "Device Policy Manager",
    "Source Port Requirements",
    "Sink Operation",
    "Collision Avoidance",
    "Speciﬁcation Conventions",   # ligature on purpose
    "Conﬂict Resolution",          # ligature on purpose
    "Fast Role Swap",
    "Vconn Management",
    "Thermal Considerations",
]

_WORDS = (
    "power delivery contract negotiation source sink cable message header "
    "data object voltage current protocol state machine timer policy engine "
    "capability request accept reject wait soft reset hard interface port "
    "partner revision structured unstructured vendor defined extended"
).split()

_LANGS = ("en", "en", "en", "es", "zh", "de")  # en-heavy on purpose


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def _body_lines(rng: random.Random, chapter: int) -> list[str]:
    """A page's worth of body lines with seeded noise."""
    lines: list[str] = []
    for _ in range(rng.randint(2, 7)):
        roll = rng.random()
        if roll < 0.45:
            lines.append(_sentence(rng, rng.randint(4, 14)))
        elif roll < 0.55:  # caption line (figure or table), sometimes noisy
            kind = rng.choice(["Figure", "Table", "T a b l e", "F i g u r e", "Table", "Figure"])
            cid = f"{chapter}{rng.choice(['.', '-'])}{rng.randint(1, 30)}"
            sep = "" if rng.random() < 0.15 else " "  # glued ids
            lines.append(f"{kind}{sep}{cid} {_sentence(rng, rng.randint(2, 6))}")
        elif roll < 0.63:  # hyphen-wrapped continuation pair
            lines.append(f"The inter-")
            lines.append(f"{rng.choice(['face', 'nal', 'mediate'])} logic handles this.")
        elif roll < 0.70:  # bullets incl. private-use glyphs
            glyph = rng.choice(["•", "", "●", "▪"])
            lines.append(f"{glyph} {_sentence(rng, rng.randint(3, 8))}")
        elif roll < 0.76:  # unicode dashes / NBSP variants
            lines.append(f"range 5–20 V and 3 A max — see above")
        elif roll < 0.82:  # dot-leader body line
            lines.append(f"{rng.choice(_WORDS)} overview {'.' * rng.randint(3, 10)} {rng.randint(1, 99)}")
        elif roll < 0.88:  # camelCase + escaped quotes
            lines.append('The deviceState moves to \\"ready\\" and portRole flips.')
        elif roll < 0.94:  # running header / footer noise
            lines.append(
                rng.choice(
                    [
                        "Universal Serial Bus Power Delivery Specification Revision 3.2",
                        "Universal.Serial-Bus Power·Delivery Specification, Version 1.1",
                        f"Page {rng.randint(1, 999)}",
                    ]
                )
            )
        else:  # isolated-letter OCR noise
            lines.append(" ".join(rng.choice("abcdefg") for _ in range(rng.randint(6, 9))))
    return lines


def _make_sections(rng: random.Random, n_chapters: int, body_start: int, n_body: int):
    """(section_id, title, page) tuples with increasing pages, some depth."""
    sections: list[tuple[str, str, int]] = []
    page = body_start
    last = body_start + n_body - 1
    for ch in range(1, n_chapters + 1):
        sections.append((str(ch), rng.choice(_TITLES), min(page, last)))
        page += rng.randint(0, 2)
        for sub in range(1, rng.randint(0, 3) + 1):
            sections.append((f"{ch}.{sub}", rng.choice(_TITLES), min(page, last)))
            page += rng.randint(0, 2)
            if rng.random() < 0.3:  # orphan grandchild → exercises parent repair
                sections.append(
                    (f"{ch}.{sub}.{rng.randint(1, 3)}", rng.choice(_TITLES), min(page, last))
                )
                page += rng.randint(0, 1)
    if rng.random() < 0.5:  # appendices
        for i, letter in enumerate("AB"[: rng.randint(1, 2)]):
            sections.append((letter, f"Appendix {rng.choice(_TITLES)}", min(page + i, last)))
            if rng.random() < 0.5:
                sections.append((f"{letter}.1", rng.choice(_TITLES), min(page + i, last)))
    return sections


def _toc_lines(rng: random.Random, sections, drop_parents: bool) -> list[str]:
    lines = ["Table Of Contents"]
    for sid, title, page in sections:
        if drop_parents and sid.count(".") == 0 and rng.random() < 0.4:
            continue  # missing parent → synthetic "Section N" insertion
        leaders = rng.choice(
            ["." * rng.randint(3, 20), " ".join("." * rng.randint(3, 8)), "· " * rng.randint(3, 8), ""]
        )
        lines.append(f"{sid} {title} {leaders} {page}")
        if rng.random() < 0.05:  # duplicate row → validation churn
            lines.append(f"{sid} {title} {leaders} {page}")
    if rng.random() < 0.3:
        lines.append("a b c d e f g h 12")  # isolated-letter noise row
    if rng.random() < 0.2:
        lines.append("Plain prose line that is not a ToC row")
    return lines


def make_document(doc_id: int, seed: int = 42, mega: bool = False) -> dict:
    """One deterministic synthetic document row."""
    rng = random.Random((seed << 20) ^ doc_id)
    host = f"host{rng.randint(0, 5)}"  # few hosts → host skew on purpose
    url = f"https://{host}.example/spec/{doc_id}"

    shape = rng.random()
    if shape < 0.04:  # malformed/empty rows → parse-failure accounting
        return {
            "url": url,
            "warc_ts": _EPOCH + _dt.timedelta(seconds=doc_id * 137),
            "html": b"<html><body><p>trunc",
            "text": "",
            "lang": rng.choice(_LANGS),
        }

    n_chapters = rng.randint(8, 14) if mega else rng.randint(2, 6)
    n_body = rng.randint(150, 400) if mega else rng.randint(4, 16)
    has_toc = shape > 0.18  # ~14% heading-driven docs (no ToC block)

    toc_pages: list[str] = []
    body_start = 2
    sections = []
    if has_toc:
        sections = _make_sections(rng, n_chapters, body_start=4, n_body=n_body)
        raw = _toc_lines(rng, sections, drop_parents=rng.random() < 0.5)
        if rng.random() < 0.04:
            raw.append("9.9 Broken row 0")  # page 0 → reference nukes whole ToC
        split_at = max(2, len(raw) // (1 + (len(raw) > 14)))
        toc_pages = ["\n".join(raw[:split_at]), "\n".join(raw[split_at:])]
        toc_pages = [p for p in toc_pages if p]
        toc_pages.append("List of Figures\nFigure 1-1 Overview diagram ...... 9")
        body_start = 1 + 1 + len(toc_pages) + 1  # title + toc pages + stop page
        sections = _make_sections(rng, n_chapters, body_start, n_body)
        raw = _toc_lines(rng, sections, drop_parents=rng.random() < 0.5)
        if rng.random() < 0.04:
            raw.append("9.9 Broken row 0")
        toc_pages = ["\n".join(raw[:split_at]), "\n".join(raw[split_at:])]
        toc_pages = [p for p in toc_pages if p]
        toc_pages.append("List of Figures\nFigure 1-1 Overview diagram ...... 9")
        body_start = 1 + len(toc_pages) + 1
    else:
        sections = _make_sections(rng, n_chapters, body_start=2, n_body=n_body)

    by_page: dict[int, list[str]] = {}
    for sid, title, page in sections:
        if rng.random() < 0.08 and has_toc:
            continue  # promised heading missing from body → validation miss
        by_page.setdefault(page, []).append(f"{sid} {title}")
    if not has_toc and rng.random() < 0.12:
        # stray appendix heading with no ToC → reference heading-sort
        # ValueError → per-doc error accounting path
        by_page.setdefault(body_start + 1, []).append("A.1 Stray Appendix Heading")

    pages: list[str] = [f"Synthetic Spec {doc_id}\nUniversal Serial Bus Power Delivery Specification Revision 3.2"]
    pages.extend(toc_pages)
    last_body = body_start + n_body - 1
    for p in range(body_start, last_body + 1):
        chapter = rng.randint(1, n_chapters)
        lines = by_page.get(p, [])[:]
        lines.extend(_body_lines(rng, chapter))
        pages.append("\n".join(lines))

    text = "\f".join(pages)
    return {
        "url": url,
        "warc_ts": _EPOCH + _dt.timedelta(seconds=doc_id * 137),
        "html": render_html(url, pages).encode("utf-8"),
        "text": text,
        "lang": rng.choice(_LANGS),
    }


def render_html(
    url: str,
    pages: list[str],
    *,
    lang: str | None = None,
    description: str | None = None,
    canonical: str | None = None,
    og_title: str | None = None,
    published_time: str | None = None,
    robots: str | None = None,
) -> str:
    """Wrap page text in boilerplate-laden markup.

    The <div class="page"> bodies escape the page text verbatim, so a
    correct DOM-heuristic extractor recovers `text` byte-identically.
    The optional head-metadata kwargs add <html lang>/<meta>/<link>
    tags (attribute-escaped); all-default output is byte-identical to
    the metadata-free form, and meta/link are void tags the block
    segmenter ignores, so q89/q90 byte/span contracts are unaffected
    either way.
    """
    nav = "".join(f'<a href="/l{i}">link {i}</a> | ' for i in range(12))
    page_divs = "".join(
        f'<div class="page" data-page="{i + 1}">{_html.escape(p)}</div>'
        for i, p in enumerate(pages)
    )
    head_extra = ""
    if description is not None:
        head_extra += f'<meta name="description" content="{_html.escape(description, quote=True)}">'
    if og_title is not None:
        head_extra += f'<meta property="og:title" content="{_html.escape(og_title, quote=True)}">'
    if canonical is not None:
        head_extra += f'<link rel="canonical" href="{_html.escape(canonical, quote=True)}">'
    if published_time is not None:
        head_extra += (
            '<meta property="article:published_time" '
            f'content="{_html.escape(published_time, quote=True)}">'
        )
    if robots is not None:
        head_extra += f'<meta name="robots" content="{_html.escape(robots, quote=True)}">'
    html_open = f'<html lang="{_html.escape(lang, quote=True)}">' if lang else "<html>"
    return (
        html_open + "<head><title>" + _html.escape(url) + "</title>" + head_extra +
        "<style>.page{margin:0}</style><script>var t=1;</script></head>"
        f"<body><header><nav>{nav}</nav></header>"
        '<aside><a href="/ad">sponsored</a> buy now cheap deals</aside>'
        f'<main id="content">{page_divs}</main>'
        "<footer>© example corp | <a href='/tos'>terms</a> | <a href='/priv'>privacy</a></footer>"
        "</body></html>"
    )


def generate_corpus(n_docs: int, seed: int = 42, mega_every: int = 40) -> list[dict]:
    """n_docs deterministic rows; every `mega_every`-th doc is a mega-doc
    (hundreds of pages) to exercise skew handling."""
    return [
        make_document(i, seed=seed, mega=(mega_every > 0 and i > 0 and i % mega_every == 0))
        for i in range(n_docs)
    ]
