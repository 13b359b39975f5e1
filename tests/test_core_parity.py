"""Differential byte-parity tests: core functions vs the reference.

Every scalar/operator in pdf_parser_spark.core is run side-by-side with
the corresponding reference function on adversarial + seeded-random
inputs; outputs must be equal to the byte (SURVEY §5 item 1).
"""

from __future__ import annotations

import random
import string

import pdf_parser_spark.core.chunking as mchunk
import pdf_parser_spark.core.headings as mhead
import pdf_parser_spark.core.matching as mmatch
import pdf_parser_spark.core.text as mtext
import pdf_parser_spark.core.toc as mtoc

NOISE_CHARS = (
    string.ascii_letters
    + string.digits
    + " \t\n.·•…‥‐‑‒–—−ﬁﬂﬀﬃﬄ\xa0 \"'\\/,;:()[]"
    + "".join(chr(c) for c in (0xF06E, 0xF06C, 0x25CF, 0x25AA, 0xF0A7, 0xF09F, 0xF097, 0x2022))
)

HANDPICKED = [
    "",
    "A ﬁle – b·c",
    "T a b l e 5-1 Foo",
    "Table5 x",
    "Figure A.1 bar",
    "word-\ncontinued",
    "foo—\nbar",
    'say \\"hi\\" now',
    "a/b / c",
    "camelCase xY9Z",
    ' "quoted"x',
    "Intro ..... 12",
    "Page 3",
    "P a g e 42",
    "U n i v e r s a l  S e r i a l  B u s",
    "....",
    "line ··· 9",
    "Universal.Serial-Bus Power·Delivery Specification Revision 3.2",
    "Universal Serial Bus Power Delivery Specification, Version 1.1 Page 9",
    "1.2.3 Deep Title ....... 77",
    "0 zero",
    "A Appendix",
    "10 Power Rules override 12",
]


def _random_strings(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    return [
        "".join(rng.choice(NOISE_CHARS) for _ in range(rng.randint(0, 120)))
        for _ in range(n)
    ]


def test_scalar_parity(ref):
    cleaner = ref.chunk.Cleaner()
    for s in HANDPICKED + _random_strings(2000, seed=1):
        assert mtext.normalize_text(s) == ref.utils.normalize_text(s), ascii(s)
        assert mtext.strip_dot_leaders(s) == ref.utils.strip_dot_leaders(s), ascii(s)
        assert mtext.norm_caption_line(s) == cleaner.norm_caption_line(s), ascii(s)
        assert mtext.is_running_header(s) == cleaner.looks_like_running_header_noisy(s), ascii(s)
        assert mtext.clean_content(s) == cleaner.clean_content(s), ascii(s)
        assert mtext.clean_heading_title(s) == cleaner.clean_heading_title(s), ascii(s)
        assert mtext.normalize_sentences(s) == cleaner.normalize_sentences(s), ascii(s)
        assert mtext.norm_id(s) == ref.validate._norm_id(s), ascii(s)
        assert mtext.looks_like_heading(s[:3], s) == ref.utils.looks_like_heading(s[:3], s), ascii(s)
        assert mmatch.clean_toc_title(s) == ref.validate.Validator()._clean_toc_title(s), ascii(s)


def _random_toc_lines(rng: random.Random, n: int) -> list[str]:
    titles = [
        "Introduction",
        "Power Rules",
        "Cable Assemblies ﬁnal",
        "USB – Type C",
        "T a b l e of things",
        "Overview .... of it",
    ]
    out = []
    for _ in range(n):
        kind = rng.randint(0, 9)
        if kind < 5:
            sid = ".".join(str(rng.randint(0, 20)) for _ in range(rng.randint(1, 4)))
            page = rng.randint(0, 1200) if rng.random() < 0.05 else rng.randint(1, 1200)
            out.append(f"{sid} {rng.choice(titles)} {'.' * rng.randint(0, 12)} {page}")
        elif kind == 5:
            sid = rng.choice("ABCXYZ") + ("." + str(rng.randint(1, 9)) if rng.random() < 0.5 else "")
            out.append(f"{sid} Appendix Stuff ..... {rng.randint(1, 999)}")
        elif kind == 6:
            out.append(rng.choice(["Table Of Contents", "List of Figures", "Page 12", "", "   "]))
        else:
            out.append(rng.choice(["prose with no page", "10 Power thing 42", "0 zero 5"]))
    return out


def test_toc_parse_parity(ref):
    rng = random.Random(2)
    for _ in range(150):
        lines = _random_toc_lines(rng, rng.randint(0, 40))
        min_dots = rng.choice([0, 0, 1])
        strip_dots = rng.random() < 0.3
        expected = [
            e.model_dump()
            for e in ref.toc.parse_toc_lines(lines, doc_title="T", min_dots=min_dots, strip_dots=strip_dots)
        ]
        got = mtoc.parse_toc_lines(lines, doc_title="T", min_dots=min_dots, strip_dots=strip_dots)
        assert got == expected


def _random_pages(rng: random.Random, n_pages: int) -> list[tuple[int, str]]:
    body = [
        "This sentence wraps onto the next li-\nne of text.",
        "See Table 5-1 for details.",
        "Figure A.1 shows the flow.",
        "Universal Serial Bus Power Delivery Specification Rev 3.2",
        "Page 42",
        "• bullet item one",
        'Some camelCase and \\"quoted\\" text.',
        "Intro ......... 12",
        "T a b l e 6.2 Cable parameters",
        "Table10.3 glued caption",
        "a b c d e f g isolated",
    ]
    titles = ["Introduction", "Power Rules Overview", "0", "ab", "Data Link Layer"]
    pages = []
    for p in range(1, n_pages + 1):
        lines = []
        for _ in range(rng.randint(0, 10)):
            k = rng.random()
            if k < 0.3:
                sid = ".".join(str(rng.randint(1, 12)) for _ in range(rng.randint(1, 3)))
                lines.append(f"{sid} {rng.choice(titles)}")
            else:
                lines.append(rng.choice(body))
        pages.append((p, "\n".join(lines)))
    return pages


def test_chunking_parity(ref):
    rng = random.Random(3)
    for _ in range(100):
        pages = _random_pages(rng, rng.randint(1, 12))
        skip = set(rng.sample(range(1, len(pages) + 1), k=rng.randint(0, min(2, len(pages)))))

        detector = ref.chunk.HeadingDetector(ref.chunk.Cleaner())
        assert mhead.detect_headings(pages, skip_pages=skip) == detector.detect_headings(
            pages, skip_pages=skip
        )

        entries = []
        for _ in range(rng.randint(0, 6)):
            sid = ".".join(str(rng.randint(1, 9)) for _ in range(rng.randint(1, 3)))
            entries.append(
                ref.toc.ToCEntry(
                    doc_title="D",
                    section_id=sid,
                    title=rng.choice(["Introduction", "Power Rules", "Link Layer"]),
                    page=rng.randint(1, len(pages)),
                    level=sid.count(".") + 1,
                    parent_id=None,
                    full_path="x",
                )
            )
        expected = ref.chunk.build_chunks_from_toc(pages, entries, skip_pages=skip)
        got = mchunk.build_chunks_from_toc(pages, [e.model_dump() for e in entries], skip_pages=skip)
        assert [mchunk.to_export_record(c) for c in got] == [
            {
                "section_path": c.section_path,
                "start_heading": f"{c.section_id} {c.title}",
                "content": c.content,
                "tables": [f"Table {t.id}" for t in c.tables],
                "figures": [f"Figure {f.id}" for f in c.figures],
                "page_range": [int(x) for x in c.page_range.split(",")],
            }
            for c in expected
        ]


def test_match_sections_parity(ref, tmp_path):
    import json

    rng = random.Random(4)
    validator = ref.validate.Validator()
    titles = [
        "Introduction",
        "Power Rules",
        "USB Type-C Connectors",
        "Universal Serial Bus Power Delivery Specification Revision 3.2",
        "1.2 Numbered Title",
        "Overview 12 . . . 34",
    ]
    for trial in range(60):
        toc = []
        for _ in range(rng.randint(0, 20)):
            sid = ".".join(str(rng.randint(1, 12)) for _ in range(rng.randint(1, 3)))
            t = rng.choice(titles)
            toc.append(
                {
                    "doc_title": "D",
                    "section_id": sid,
                    "title": t,
                    "page": rng.randint(1, 60),
                    "level": sid.count(".") + 1,
                    "parent_id": None,
                    "full_path": f"{sid} {t}",
                }
            )
        chunks = []
        pool = toc + toc[: rng.randint(0, 3)]
        rng.shuffle(pool)
        for e in pool:
            if rng.random() < 0.2:
                continue
            title = e["title"] if rng.random() < 0.8 else rng.choice(titles)
            chunks.append(
                {
                    "section_path": f"{e['section_id']} {title}",
                    "start_heading": f"{e['section_id']} {title}",
                    "content": "words and Table 5-1 " * rng.randint(0, 20),
                    "tables": [f"Table {rng.randint(1, 20)}.{rng.randint(1, 9)}"],
                    "figures": [f"Figure {rng.randint(1, 20)}-{rng.randint(1, 9)}"],
                    "page_range": [e["page"], e["page"] + 1],
                }
            )
        tp = tmp_path / f"t{trial}.jsonl"
        cp = tmp_path / f"c{trial}.jsonl"
        tp.write_text("\n".join(json.dumps(x) for x in toc))
        cp.write_text("\n".join(json.dumps(x) for x in chunks))
        ref_toc_loaded = validator.load_toc(str(tp))
        ref_chunks_loaded = validator.load_chunks(str(cp))
        expected = validator.match_sections(ref_toc_loaded, ref_chunks_loaded)

        got = mmatch.match_sections(
            mmatch.load_toc_records(toc), [mmatch.coerce_chunk_record(c) for c in chunks]
        )
        assert got == expected
