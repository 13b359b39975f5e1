"""Figure/table ID reconciliation (E5/E6/J6) vs the reference's
extractor semantics, replayed on the synthetic corpus."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_parser_spark.operators import extract as ox
from pdf_parser_spark.operators import reconcile as rc
from pdf_parser_spark.sources.corpus import synthetic_documents
from pdf_parser_spark.sources.synth import generate_corpus

ID_LIST_RX = re.compile(r"\bFigure\s+((?:\d+|[A-Z])(?:\.\d+)*[a-z]?)\b", re.IGNORECASE)
ID_STRICT_RE = re.compile(r"(?:\d+(?:\.\d+)*|[A-Z](?:\.\d+)+)[a-z]?")


def test_reconciliation_matches_reference_semantics(spark):
    docs = synthetic_documents(spark, 30, seed=42)
    extracted = ox.extract_documents(docs).cache()
    out = {r["url"]: r for r in rc.reconcile_caption_ids(docs, extracted, span=1).collect()}

    # reference replay in pure python per doc (extract_from_pdf +
    # extract_from_jsonl + set reconciliation)
    by_url = {d["url"]: d for d in generate_corpus(30, seed=42)}
    ex_rows = {
        r["url"]: r for r in extracted.select("url", "toc_end", "chunks").collect()
    }
    checked = 0
    for url, d in by_url.items():
        r = ex_rows[url]
        if r["toc_end"] is None:
            assert url not in out or out[url]["figs_missing"] is not None
            continue
        pages = d["text"].split("\f")
        lof_pages = pages[r["toc_end"] : r["toc_end"] + 1]  # span=1
        listed = {m.group(1) for p in lof_pages for m in ID_LIST_RX.finditer(p)}
        captured = set()
        for c in r["chunks"] or []:
            for s in c["figures"] or []:
                m = ID_STRICT_RE.search(str(s))
                if m:
                    captured.add(m.group(0))
        if url not in out:
            assert not listed and not captured
            continue
        got = out[url]
        assert set(got["figs_matched"]) == (listed & captured), url
        assert set(got["figs_missing"]) == (listed - captured), url
        assert set(got["figs_extra"]) == (captured - listed), url
        assert got["n_figs_matched"] == len(listed & captured)
        checked += 1
    assert checked >= 15
    extracted.unpersist()
