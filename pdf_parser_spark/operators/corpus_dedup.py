"""Corpus-level cross-document hygiene: global line dedup and
benchmark decontamination.

The two curation steps that CANNOT be computed per-row (unlike
webtext_filters' scan-shaped heuristics): both need corpus-wide state.

  corpus_line_dedup   C4/RefinedWeb-style global duplicate-line
                      removal: a line that occurs in more than
                      `max_doc_freq` distinct documents is boilerplate
                      (cookie banners, nav footers) and is dropped from
                      EVERY document, preserving the order of the
                      surviving lines. The reference's running-header
                      test (chunk.py:229-233, per-document) is the
                      same idea; this is its corpus-wide big brother.

  decontaminate       benchmark n-gram decontamination: flag corpus
                      documents sharing word n-grams with a held-out
                      evaluation set (the GPT-3 appendix-C / Dolma
                      decon pass), with per-document matched-gram
                      counts — accountable, not a silent drop.

Scale notes (100 TB):
  - corpus_line_dedup is ONE shuffle keyed by line text for the
    frequency count, then a second shuffle joining lines back to the
    frequency table (co-partitioned on the same key, so AQE reuses the
    exchange), then a per-document reassembly agg keyed by doc. No
    driver-side state. For very wide corpora pass a line-hash
    (xxhash64) as the count key to shrink shuffle bytes — the oracle
    twin (q72) uses raw lines so DuckDB can replay it.
  - decontaminate broadcasts the benchmark gram set: the eval side is
    thousands of documents vs the corpus' billions, so the corpus scan
    never shuffles — gram explode, broadcast-hash semi-probe, partial
    count agg keyed by doc (map-side combine). If the benchmark ever
    outgrows broadcast range, swap the broadcast join for a bloom
    filter on gram hash; the plan shape otherwise holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _lines(col: Column) -> Column:
    return F.split(col, r"\n")


def corpus_line_dedup(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int = 1,
    min_line_chars: int = 1,
) -> DataFrame:
    """Remove lines that occur in more than `max_doc_freq` distinct
    documents; returns one row per input document:

      (key, text_dedup, n_lines, n_lines_removed, removed_char_frac)

    Lines shorter than `min_line_chars` after trim (e.g. blank lines)
    are never counted and never removed — they preserve document
    structure. Line identity for counting is the TRIMMED line; the
    original line text is what survives into `text_dedup`. Documents
    with NULL text yield NULL text_dedup and zero counts.
    """
    key = F.col(key_col)
    # identity-trim strips \r and \t as well as spaces: CRLF corpora
    # split on \n leave a trailing \r on every line — under a
    # space-only trim a blank separator line becomes the countable
    # 1-char line "\r" present in nearly every document, which the
    # frequency filter would then classify as corpus-wide boilerplate
    # and delete, collapsing paragraph structure; and identical
    # content lines would never match across CRLF and LF documents.
    exploded = (
        df.select(key_col, F.posexplode(_lines(F.col(text_col))).alias("pos", "line"))
        .withColumn("nline", F.expr("btrim(line, ' \\t\\r')"))
    )
    countable = F.length(F.col("nline")) >= min_line_chars

    # corpus-wide frequency: distinct docs per (trimmed) line. The
    # two-phase countDistinct partial-aggregates map-side, so the
    # shuffle carries (line, partial doc set sketch), not raw rows.
    dup_lines = (
        exploded.where(countable)
        .groupBy("nline")
        .agg(F.countDistinct(key_col).alias("doc_freq"))
        .where(F.col("doc_freq") > max_doc_freq)
        .select("nline", F.lit(True).alias("is_dup"))
    )

    flagged = exploded.join(dup_lines, "nline", "left").withColumn(
        "drop", countable & F.coalesce(F.col("is_dup"), F.lit(False))
    )

    # reassemble in document order: collect_list order is arbitrary, so
    # sort (pos, line) structs before joining the survivors back up.
    kept_struct = F.when(~F.col("drop"), F.struct("pos", "line"))
    assembled = flagged.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            "\n",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("drop").cast("long")).alias("n_lines_removed"),
        F.sum(F.when(F.col("drop"), F.length("line")).otherwise(F.lit(0)).cast("long")).alias(
            "_removed_chars"
        ),
        F.sum(F.length("line").cast("long")).alias("_total_chars"),
    )
    assembled = assembled.withColumn(
        "removed_char_frac",
        F.when(F.col("_total_chars") == 0, F.lit(0.0)).otherwise(
            F.col("_removed_chars") / F.col("_total_chars").cast("double")
        ),
    ).drop("_removed_chars", "_total_chars")

    # left join restores NULL-text documents (posexplode drops them)
    out = (
        df.select(key_col)
        .join(assembled, key_col, "left")
        .withColumn("n_lines", F.coalesce("n_lines", F.lit(0)))
        .withColumn("n_lines_removed", F.coalesce("n_lines_removed", F.lit(0)))
        .withColumn("removed_char_frac", F.coalesce("removed_char_frac", F.lit(0.0)))
    )
    return out


def with_word_ngrams(
    df: DataFrame, text_col: str, n: int, out_col: str, distinct: bool = True
) -> DataFrame:
    """Adds `out_col` = word n-grams of `text_col` (array<string>,
    whitespace-tokenized, space-joined; distinct=False keeps every
    occurrence).

    DataFrame-level ON PURPOSE: the word array MUST be a projected
    column referenced >=2 times (size + the slice inside the lambda) —
    an inline `F.split(...)` expression inside the transform() lambda
    re-splits the whole document once PER GRAM, O(words²) per doc
    (the dedup.shingles / line_dup_stats bug class; a 17k-word
    mega-doc turns a 60 s corpus pass into 25 minutes — measured).
    CollapseProject keeps the hoist because the split is non-cheap and
    multiply-referenced."""
    base = df.withColumn("__ng_w", F.split(F.trim(F.col(text_col)), r"\s+"))
    words = F.col("__ng_w")
    n_words = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_words - n + 1, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    if distinct:
        grams = F.array_distinct(grams)
    out = F.when(n_words >= n, grams).otherwise(F.array().cast("array<string>"))
    return base.withColumn(out_col, out).drop("__ng_w")


def ngram_repetition_stats(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher §A1.1 repetition signals, per document:

      n_grams              total (non-distinct) word n-grams
      top_gram             most frequent n-gram (ties: lexicographic max)
      top_gram_count       its occurrence count
      top_gram_char_frac   chars in its occurrences / chars in all grams
      dup_gram_char_frac   chars in grams occurring >=2 times / all-gram chars

    Documents with fewer than n words have zero grams, NULL top_gram
    and 0.0 fractions. Unlike the scan-shaped gopher_quality_flags
    this needs per-(doc, gram) counts, so it is explode-shaped: rows
    proportional to tokens, two partial-agged shuffles ((key, gram)
    then key) — the same scale envelope as MinHash shingling, with no
    per-doc quadratic term for mega-documents (the array-only
    formulation would be O(words²) per doc).
    """
    key = F.col(key_col)
    grams = with_word_ngrams(df, text_col, n, "_grams", distinct=False).select(
        key_col, F.explode("_grams").alias("gram")
    )
    per_gram = grams.groupBy(key_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    gram_chars = F.col("cnt") * F.length("gram")
    per_doc = per_gram.groupBy(key_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.sum(gram_chars).alias("_all_chars"),
        F.sum(F.when(F.col("cnt") >= 2, gram_chars).otherwise(F.lit(0))).alias("_dup_chars"),
        F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("_top"),
    )
    per_doc = per_doc.select(
        key_col,
        "n_grams",
        F.col("_top")["gram"].alias("top_gram"),
        F.col("_top")["cnt"].alias("top_gram_count"),
        F.when(F.col("_all_chars") == 0, F.lit(0.0))
        .otherwise(
            F.col("_top")["cnt"] * F.length(F.col("_top")["gram"])
            / F.col("_all_chars").cast("double")
        )
        .alias("top_gram_char_frac"),
        F.when(F.col("_all_chars") == 0, F.lit(0.0))
        .otherwise(F.col("_dup_chars") / F.col("_all_chars").cast("double"))
        .alias("dup_gram_char_frac"),
    )
    return (
        df.select(key_col)
        .join(per_doc, key_col, "left")
        .withColumn("n_grams", F.coalesce("n_grams", F.lit(0)))
        .withColumn("top_gram_count", F.coalesce("top_gram_count", F.lit(0)))
        .withColumn("top_gram_char_frac", F.coalesce("top_gram_char_frac", F.lit(0.0)))
        .withColumn("dup_gram_char_frac", F.coalesce("dup_gram_char_frac", F.lit(0.0)))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_matched_grams: int = 1,
) -> DataFrame:
    """Per-corpus-document benchmark contamination accounting:

      (key, n_grams, n_matched_grams, contaminated)

    n_grams is the document's count of DISTINCT word n-grams;
    n_matched_grams how many of those occur anywhere in the benchmark
    set; contaminated = n_matched_grams >= min_matched_grams.
    Documents with fewer than n words have zero grams and are never
    contaminated.

    The benchmark side is reduced to its distinct gram set and
    BROADCAST — the corpus side never shuffles on gram text; the only
    shuffle is the per-document count agg (partial map-side).
    """
    corpus_grams = with_word_ngrams(corpus, text_col, n, "_grams").select(
        key_col,
        F.size("_grams").alias("n_grams"),
        F.explode_outer("_grams").alias("gram"),
    )

    bench_grams = (
        with_word_ngrams(benchmark, text_col, n, "_grams")
        .select(F.explode("_grams").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(True))
    )

    joined = corpus_grams.join(F.broadcast(bench_grams), "gram", "left")
    out = joined.groupBy(key_col).agg(
        F.max("n_grams").alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit").cast("long"), F.lit(0))).alias("n_matched_grams"),
    )
    return out.withColumn(
        "contaminated", F.col("n_matched_grams") >= F.lit(min_matched_grams)
    )
