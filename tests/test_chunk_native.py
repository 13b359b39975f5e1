"""Native chunk-stage operators vs the reference-faithful core.

The Catalyst-visible operators in operators/chunk_native.py must agree
with core/headings.py + core/text.py (which are themselves golden-
tested against /root/reference) on adversarial line inputs, and the
window/join operators must reproduce the core chunker's bounds and
page-gather semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from pdf_parser_spark.core import headings as core_headings
from pdf_parser_spark.core import text as core_text
from pdf_parser_spark.operators import chunk_native as cn

HEADING_LINES = [
    "3 Protocol Layer Messaging",
    "3.2 Data Link Layer",
    "A Appendix Overview",
    "A.1 Cable Assemblies",
    "Page 12",
    "7 4711",
    "3 ab",
    "0 Zero Title",
    "4 0101 binary run",
    "2 Universal Serial Bus Power Delivery Specification Revision 3.2",
    "5 Power .... 99",
    "plain prose line",
    "1.2.3 State Machines",
    "10 a b c d e f g noise",
    "6 T a b l e of things",  # isolated-letter run + caption-ish
    "9   spaced   title line",
]

CAPTION_LINES = [
    "Figure 5-1 Overview diagram",
    "Table 10.3 Parameter values",
    "T a b l e 7.7 thermal budget",
    "F i g u r e 2.1 system states",
    "Figure A.1.2b corner case",
    "Table5.4 glued id",
    "no captions here",
    "Figure without id",
]


def test_heading_extract_matches_core(spark):
    rows = [Row(url="u", line=s) for s in HEADING_LINES]
    df = spark.createDataFrame(rows)
    got = {
        (r["section_id"], r["title"])
        for r in cn.extract_headings_native(df).select("section_id", "title").collect()
    }
    want = set()
    for s in HEADING_LINES:
        hit = core_headings.extract_heading(s)
        if hit:
            want.add(hit)
    assert got == want
    # sanity: the clean headings survived, the noise did not
    assert ("3", "Protocol Layer Messaging") in got
    assert ("A.1", "Cable Assemblies") in got
    assert all(sid != "7" for sid, _ in got)


def test_caption_lists_match_core_order_and_dupes(spark):
    lines = CAPTION_LINES + ["Figure 5-1 Overview diagram"]  # duplicate
    rows = [Row(url="u", pos=i, line=s) for i, s in enumerate(lines)]
    df = spark.createDataFrame(rows)
    out = cn.caption_lists_native(df).collect()[0]
    figures, tables = list(out["figures"]), list(out["tables"])

    want_figs, want_tabs = [], []
    for s in lines:
        norm = core_text.norm_caption_line(s)
        m = core_text.FIGURE_CAPTION.search(norm)
        if m:
            want_figs.append(m.group(1))
            continue
        m = core_text.TABLE_CAPTION.search(norm)
        if m:
            want_tabs.append(m.group(1))
    assert figures == want_figs
    assert tables == want_tabs
    assert figures.count("5") == 2  # ordered duplicates preserved


def test_keep_content_line_matches_core(spark):
    lines = [
        "see Table 5 for details",
        "3.2 Heading Shaped Line",
        "Universal Serial Bus Power Delivery Specification Revision 3.2",
        "Page 42",
        "ordinary body prose",
        "Figure 9 caption mention trumps heading shape 1.2",
    ]
    rows = [Row(line=s) for s in lines]
    df = spark.createDataFrame(rows).withColumn("keep", cn.keep_content_line_native(F.col("line")))
    got = {r["line"]: r["keep"] for r in df.collect()}
    from pdf_parser_spark.core.chunking import keep_content_line

    for s in lines:
        assert got[s] == keep_content_line(s), s


def test_chunk_bounds_lead_semantics(spark):
    toc = spark.createDataFrame(
        [
            Row(url="u", section_id="1", title="a", page=2),
            Row(url="u", section_id="1.1", title="b", page=4),
            Row(url="u", section_id="2", title="c", page=4),
            Row(url="u", section_id="3", title="d", page=9),
            Row(url="v", section_id="1", title="e", page=5),
        ]
    )
    got = {
        (r["url"], r["section_id"]): (r["page_start"], r["page_end"])
        for r in cn.chunk_bounds_native(toc, last_page=12).collect()
    }
    # ties on page order by section_id; pend = next page - 1 clamped >= pstart
    assert got[("u", "1")] == (2, 3)
    assert got[("u", "1.1")] == (4, 4)   # next row (2, page 4) - 1 = 3 → clamp to 4
    assert got[("u", "2")] == (4, 8)
    assert got[("u", "3")] == (9, 12)    # last chunk runs to last_page
    assert got[("v", "1")] == (5, 12)


def test_gather_pages_overlap_reuse(spark):
    pages = spark.createDataFrame(
        [Row(url="u", page_no=p, line=f"line{p}") for p in range(1, 7)]
    )
    bounds = spark.createDataFrame(
        [
            Row(url="u", section_id="1", title="a", page_start=2, page_end=4),
            Row(url="u", section_id="2", title="b", page_start=4, page_end=6),
        ]
    )
    got = (
        cn.gather_chunk_pages_native(pages, bounds)
        .groupBy("section_id")
        .agg(F.sort_array(F.collect_list("page_no")).alias("pp"))
        .collect()
    )
    by_sid = {r["section_id"]: list(r["pp"]) for r in got}
    # page 4 contributes to BOTH chunks (chunk.py:241-253 reuse semantics)
    assert by_sid == {"1": [2, 3, 4], "2": [4, 5, 6]}


@pytest.mark.parametrize(
    "line",
    ["Table 5.1 nbsp sep", "Figure 3–2 en dash", "T a b l e 9.9 spread"],
)
def test_norm_caption_line_native_matches_core(spark, line):
    df = spark.createDataFrame([Row(line=line)]).select(
        cn.norm_caption_line_native(F.col("line")).alias("n")
    )
    assert df.collect()[0]["n"] == core_text.norm_caption_line(line)
