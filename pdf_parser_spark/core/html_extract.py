"""HTML main-content extraction via DOM heuristics (north_rule).

Generalizes the reference's line-level noise filtering (SURVEY §2.11:
text-density ≈ the letters-vs-digits test utils.py:239-241,
link-density ≈ the brand/footer filters chunk.py:235-238, tag-depth ≈
heading level toc.py:193) to HTML boilerplate stripping:

  1. segment the document into BLOCKS at block-level tag boundaries
     (stdlib html.parser — no external dependency);
  2. score each block: n_chars, link_chars (chars inside <a>), tag
     depth, ancestor-boilerplate flag (nav/header/footer/aside/script/
     style/form/head subtrees);
  3. classify content vs boilerplate: not under a boilerplate
     ancestor, link density ≤ threshold, and minimum text mass —
     the classic text-to-tag-ratio family of heuristics;
  4. assemble the main text by joining content-block texts with a
     separator (the synthetic corpus encodes page breaks as block
     boundaries, so separator "\\f" reproduces the pre-extracted
     `text` column byte-identically — the per-url invariant).

Pure str→records Python: runs unchanged inside the Arrow-batched
Spark operator (operators/html_extract.py) and in unit tests.
"""

from __future__ import annotations

import codecs
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

BLOCK_TAGS = frozenset(
    "p div section article main li h1 h2 h3 h4 h5 h6 td th pre blockquote".split()
)
BOILERPLATE_TAGS = frozenset(
    "script style nav header footer aside noscript template form iframe svg head title".split()
)
VOID_TAGS = frozenset("br hr img meta link input area base col embed source track wbr".split())

DEFAULT_MAX_LINK_DENSITY = 0.33
DEFAULT_MIN_CHARS = 1


@dataclass
class Block:
    block_no: int
    tag_path: str
    depth: int
    text: str = ""
    n_chars: int = 0
    n_link_chars: int = 0
    under_boilerplate: bool = False
    open_depth: int = 0  # stack depth at open; block closes when the stack pops below it

    @property
    def link_density(self) -> float:
        return (self.n_link_chars / self.n_chars) if self.n_chars else 0.0


@dataclass
class _State:
    blocks: list[Block] = field(default_factory=list)
    current: Block | None = None


class _BlockParser(HTMLParser):
    """Streaming block segmenter: text lands in the innermost open
    block; entering a block-level tag closes the previous block."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.boiler_depth = 0
        self.link_depth = 0
        self.state = _State()

    # -- block lifecycle -------------------------------------------------
    def _open_block(self) -> None:
        s = self.state
        s.current = Block(
            block_no=len(s.blocks),
            tag_path="/".join(self.stack),
            depth=len(self.stack),
            under_boilerplate=self.boiler_depth > 0,
            open_depth=len(self.stack),
        )
        s.blocks.append(s.current)

    def _close_block(self) -> None:
        self.state.current = None

    # -- parser callbacks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in VOID_TAGS:
            if tag == "br" and self.state.current is not None:
                self.state.current.text += "\n"
            return
        self.stack.append(tag)
        if tag in BOILERPLATE_TAGS:
            self.boiler_depth += 1
            self._close_block()  # boilerplate text never merges into a prior block
        if tag == "a":
            self.link_depth += 1
        if tag in BLOCK_TAGS:
            self._open_block()

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in VOID_TAGS:
            return
        # pop to the matching open tag (tolerates misnesting)
        if tag in self.stack:
            while self.stack:
                t = self.stack.pop()
                if t in BOILERPLATE_TAGS:
                    self.boiler_depth -= 1
                if t == "a":
                    self.link_depth -= 1
                if t in BLOCK_TAGS:
                    self._close_block()
                cur = self.state.current
                if cur is not None and len(self.stack) < cur.open_depth:
                    self._close_block()  # anonymous block's subtree ended
                if t == tag:
                    break

    def handle_data(self, data: str) -> None:
        if not data:
            return
        cur = self.state.current
        if cur is None:
            # text outside any block tag (e.g. bare <body> text): open
            # an anonymous block so no content is silently dropped
            self._open_block()
            cur = self.state.current
        cur.text += data
        n = len(data)
        cur.n_chars += n
        if self.link_depth > 0:
            cur.n_link_chars += n


def segment_blocks(html: str | bytes | None) -> list[Block]:
    """Parse HTML into scored blocks; tolerant of truncated markup."""
    if html is None:
        return []
    html = decode_html(html)
    parser = _BlockParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass  # keep whatever blocks were segmented before the error
    return [b for b in parser.state.blocks if b.n_chars > 0]


# <meta charset=utf-8> and the legacy
# <meta http-equiv=Content-Type content="text/html; charset=...">
# both reduce to a charset= token inside a meta tag
_CHARSET_RX = re.compile(rb"(?is)<meta[^>]*charset\s*=\s*[\"']?\s*([a-z0-9_\-:.]+)")


def sniff_charset(head: bytes) -> str | None:
    """Declared encoding of an HTML byte stream, or None: BOM first
    (the authoritative signal), then a meta charset token in the
    given prefix (the WHATWG prescan, simplified). Only names the
    codec registry accepts are returned."""
    if head.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if head.startswith(b"\xff\xfe") or head.startswith(b"\xfe\xff"):
        return "utf-16"  # BOM-aware: picks the right endianness itself
    m = _CHARSET_RX.search(head)
    if m:
        name = m.group(1).decode("ascii", errors="replace")
        try:
            codecs.lookup(name)
        except LookupError:
            return None
        return name
    return None


def decode_html(html: str | bytes | None) -> str:
    """bytes → str honoring the page's own declared charset (BOM or
    meta prescan over the first 2 KiB), falling back to lenient
    UTF-8. A wrong declaration degrades to replacement chars, never
    an exception — crawl bytes must not kill a task. str passes
    through; None → ''."""
    if html is None:
        return ""
    if isinstance(html, str):
        return html
    b = bytes(html)
    enc = sniff_charset(b[:2048])
    if enc:
        try:
            return b.decode(enc, errors="replace")
        except Exception:
            pass
    return b.decode("utf-8", errors="replace")


METADATA_FIELDS = (
    "title",
    "lang",
    "description",
    "canonical",
    "og_title",
    "og_description",
    "published_time",
    "robots",
)


class _MetadataParser(HTMLParser):
    """Head-metadata harvester: <title> text, <html lang>, meta
    description / og:title / og:description, canonical link. First
    occurrence wins for every field (the de-facto crawler rule — a
    second <title> deeper in a malformed page never overrides the
    head's). convert_charrefs + HTMLParser's attribute decoding give
    entity-unescaped values for free."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.meta: dict[str, str] = {}
        self._in_title = False
        self._title_done = False
        self._title_parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        a = {(k or "").lower(): ("" if v is None else v) for k, v in attrs}
        if tag == "html" and a.get("lang"):
            self.meta.setdefault("lang", a["lang"].strip())
        elif tag == "title" and not self._title_done:
            self._in_title = True
        elif tag == "meta":
            name = (a.get("name") or a.get("property") or "").lower()
            content = a.get("content")
            if content is None:
                return
            if name == "description":
                self.meta.setdefault("description", content)
            elif name == "og:title":
                self.meta.setdefault("og_title", content)
            elif name == "og:description":
                self.meta.setdefault("og_description", content)
            elif name in ("article:published_time", "date"):
                # either source fills the one field; first occurrence
                # of either wins (article: meta usually precedes a
                # legacy name="date" in real pages)
                self.meta.setdefault("published_time", content)
            elif name == "robots":
                self.meta.setdefault("robots", content)
        elif tag == "link":
            if "canonical" in a.get("rel", "").lower().split() and a.get("href"):
                self.meta.setdefault("canonical", a["href"].strip())

    def handle_endtag(self, tag: str) -> None:
        if tag.lower() == "title" and self._in_title:
            self._in_title = False
            self._title_done = True
            self.meta.setdefault("title", "".join(self._title_parts).strip())

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_parts.append(data)


def extract_metadata(html: str | bytes | None) -> dict[str, str | None]:
    """Head metadata of a page as {field: value-or-None} over
    METADATA_FIELDS. Tolerant of truncated/malformed markup (a page
    cut mid-<title> keeps the captured prefix). Fields are reported
    RAW — no cross-field fallback; callers coalesce(title, og_title)
    themselves so the provenance of a title stays visible."""
    out: dict[str, str | None] = {k: None for k in METADATA_FIELDS}
    if html is None:
        return out
    html = decode_html(html)
    parser = _MetadataParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    if "title" not in parser.meta and parser._title_parts:
        parser.meta["title"] = "".join(parser._title_parts).strip()
    out.update(parser.meta)
    return out


def classify_block(
    block: Block,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    min_chars: int = DEFAULT_MIN_CHARS,
) -> bool:
    """True = main content, False = boilerplate."""
    if block.under_boilerplate:
        return False
    if block.n_chars < min_chars:
        return False
    return block.link_density <= max_link_density


def extract_main_text(
    html: str | bytes | None,
    separator: str = "\f",
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    min_chars: int = DEFAULT_MIN_CHARS,
) -> str:
    """Boilerplate-stripped main text (content blocks joined in
    document order)."""
    blocks = segment_blocks(html)
    kept = [b.text for b in blocks if classify_block(b, max_link_density, min_chars)]
    return separator.join(kept)
