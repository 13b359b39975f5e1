"""Figure/table ID reconciliation (SURVEY §2.5 E5/E6 + §2.7 J6 + A8).

The reference cross-checks the IDs promised by the document's
List-of-Figures/List-of-Tables pages against the IDs its chunker
actually captured (orchestrate.py:107-135 extract_from_pdf/jsonl,
341-346 set reconciliation) — per corpus document here:

  listed side   ranged page scan (the pages right after the ToC stop
                marker) → regexp_extract_all with the reference's
                list grammar (orchestrate.py:26 ID_LIST_RX) → per-url
                distinct sets (E5, A8)
  captured side explode chunk caption strings → strict-ID regex
                (orchestrate.py:27 ID_STRICT_RE) → per-url sets (E6)
  reconcile     array_intersect / array_except (J6) + counts

One scan per side, one groupBy(url) each, broadcast-joinable ranges —
every step native/codegen'd, arrays sorted for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# orchestrate.py:26-27 grammars (Java regex; (?i) scoped like the ref)
ID_LIST_RX = r"(?i)\bFigure\s+((?:\d+|[A-Z])(?:\.\d+)*[a-z]?)\b"
ID_LIST_TAB_RX = r"(?i)\bTable\s+((?:\d+|[A-Z])(?:\.\d+)*[a-z]?)\b"
ID_STRICT_RX = r"(?:\d+(?:\.\d+)*|[A-Z](?:\.\d+)+)[a-z]?"


def listed_caption_ids(
    docs: DataFrame, ranges: DataFrame, span: int = 2, url_col: str = "url"
) -> DataFrame:
    """E5: distinct figure/table IDs on the list pages.

    `ranges` supplies (url, toc_end); the LoF/LoT pages are the `span`
    pages after the ToC stop marker (the reference hardcodes page
    ranges for its one PDF — here they derive per document).
    """
    pages = docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split("text", "\f")).alias("pos", "page"),
    ).withColumn("page_no", F.col("pos") + 1)
    r = ranges.select(F.col(url_col).alias("url"), "toc_end").where(F.col("toc_end").isNotNull())
    lof = pages.join(F.broadcast(r), on="url").where(
        F.col("page_no").between(F.col("toc_end") + 1, F.col("toc_end") + span)
    )
    figs = F.array_distinct(F.flatten(F.collect_list(F.regexp_extract_all("page", F.lit(ID_LIST_RX), 1))))
    tabs = F.array_distinct(F.flatten(F.collect_list(F.regexp_extract_all("page", F.lit(ID_LIST_TAB_RX), 1))))
    return lof.groupBy("url").agg(
        F.array_sort(figs).alias("figs_listed"), F.array_sort(tabs).alias("tabs_listed")
    )


def captured_caption_ids(chunks: DataFrame, url_col: str = "url") -> DataFrame:
    """E6: strict IDs actually captured in chunk caption strings."""
    figs = chunks.select(F.col(url_col).alias("url"), F.explode_outer("figures").alias("s"))
    tabs = chunks.select(F.col(url_col).alias("url"), F.explode_outer("tables").alias("s"))

    def harvest(df):
        return (
            df.withColumn("id", F.regexp_extract("s", ID_STRICT_RX, 0))
            .where(F.col("id") != "")
            .groupBy("url")
            .agg(F.array_sort(F.collect_set("id")).alias("ids"))
        )

    f = harvest(figs).withColumnRenamed("ids", "figs_captured")
    t = harvest(tabs).withColumnRenamed("ids", "tabs_captured")
    return f.join(t, on="url", how="full_outer")


def reconcile_sets(listed: DataFrame, captured: DataFrame) -> DataFrame:
    """J6 core: full-outer join on url, per-kind matched/missing/extra
    id arrays (sorted for deterministic output) + match counts.
    Inputs: listed(url, figs_listed, tabs_listed) and
    captured(url, figs_captured, tabs_captured)."""
    j = listed.join(captured, on="url", how="full_outer")
    empty = F.array().cast("array<string>")
    cols = {}
    for kind in ("figs", "tabs"):
        a = F.coalesce(F.col(f"{kind}_listed"), empty)
        b = F.coalesce(F.col(f"{kind}_captured"), empty)
        cols[f"{kind}_matched"] = F.array_sort(F.array_intersect(a, b))
        cols[f"{kind}_missing"] = F.array_sort(F.array_except(a, b))
        cols[f"{kind}_extra"] = F.array_sort(F.array_except(b, a))
    out = j.select(
        "url",
        *[c.alias(n) for n, c in cols.items()],
    )
    for kind in ("figs", "tabs"):
        out = out.withColumn(f"n_{kind}_matched", F.size(f"{kind}_matched"))
    return out


def reconcile_caption_ids(
    docs: DataFrame, extracted: DataFrame, span: int = 2
) -> DataFrame:
    """J6 per document: matched/missing/extra ID sets and counts, both
    kinds. `extracted` is the operators.extract output (provides
    toc_end and the chunks array)."""
    from .extract import chunks_table

    listed = listed_caption_ids(docs, extracted.select("url", "toc_end"), span=span)
    captured = captured_caption_ids(chunks_table(extracted))
    return reconcile_sets(listed, captured)
