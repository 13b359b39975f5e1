"""ToC graph + knowledge-graph triple extraction (SURVEY §2.10).

The reference documents `toc-graph` (src/graph/toc_graph_simple.py:
build_toc_graph / write_graph_json) and `kg` (src/graph/kg_simple.py:
extract_triples / write_triples_json) in README.md:63-69 and in the
compiled run.pyc import table, but ships neither module — these are
the documented-but-absent capabilities re-specified Spark-first:

  toc_graph_edges     child→parent edge list (pure projection)
  toc_graph_json      per-url adjacency assembled with ordered
                      collect_list (driver-side json per doc)
  extract_triples     sentence split → SVO pattern match over a small
                      relation-verb lexicon, one codegen'd projection

Scale: both are stateless projections + one groupBy(url); no
cross-document state, no iteration — graph analytics beyond assembly
(PageRank etc.) would layer on GraphFrames/joins, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# small fixed relation lexicon for the SVO extractor; ANSI-regex so the
# DuckDB oracle can replay it
RELATION_VERBS = ("is", "has", "uses", "supports", "requires", "provides", "contains")

TRIPLE_RX = (
    r"^\s*([A-Za-z][A-Za-z0-9_-]*)\s+("
    + "|".join(RELATION_VERBS)
    + r")\s+([A-Za-z][A-Za-z0-9_-]*)"
)


def toc_graph_edges(toc: DataFrame) -> DataFrame:
    """(url, child, parent) edge list; roots have parent NULL."""
    return toc.select(
        "url",
        F.col("section_id").alias("child"),
        F.col("parent_id").alias("parent"),
        "title",
        "page",
    )


def toc_graph_json(toc: DataFrame) -> DataFrame:
    """Per-url adjacency document: ordered nodes + edges as JSON string
    (the write_graph_json sink shape, one row per url)."""
    nodes = F.array_sort(
        F.collect_list(F.struct("page", "section_id", "title"))
    )
    edges = F.array_compact(
        F.collect_list(
            F.when(
                F.col("parent_id").isNotNull(),
                F.struct(F.col("parent_id").alias("src"), F.col("section_id").alias("dst")),
            )
        )
    )
    return toc.groupBy("url").agg(
        F.to_json(F.struct(nodes.alias("nodes"), edges.alias("edges"))).alias("graph_json")
    )


def extract_triples(
    sentences: DataFrame, url_col: str = "url", sent_col: str = "sentence"
) -> DataFrame:
    """(url, sentence) → (url, subj, pred, obj) rows; non-matching
    sentences drop out. One projection + filter, zero shuffles."""
    s = F.col(sent_col)
    return (
        sentences.select(
            F.col(url_col).alias("url"),
            F.lower(F.regexp_extract(s, TRIPLE_RX, 1)).alias("subj"),
            F.lower(F.regexp_extract(s, TRIPLE_RX, 2)).alias("pred"),
            F.lower(F.regexp_extract(s, TRIPLE_RX, 3)).alias("obj"),
        )
        .where((F.col("subj") != "") & (F.col("obj") != ""))
    )


def sentences_from_text(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Split document text into (url, sent_no, sentence) rows on
    sentence punctuation — the explode feeding extract_triples."""
    parts = F.split(F.col(text_col), r"[.!?]\s+")
    return docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(parts).alias("sent_no", "sentence"),
    ).where(F.trim("sentence") != "")
