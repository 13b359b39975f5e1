"""Corpus-level hygiene: global line dedup + benchmark decontamination."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import corpus_dedup as cd


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "subscribe now" appears in 3 docs -> corpus boilerplate
        (1, "alpha beta\nsubscribe now\ngamma delta"),
        (2, "subscribe now\nunique two line"),
        (3, "totally unique\n\nsubscribe now"),
        (4, "one of a kind"),
        (5, None),
        (6, ""),
        # " subscribe now " trims to the dup line -> removed too,
        # while the untrimmed original never matters for identity
        (7, "  subscribe now  \nkept here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_line_dedup_removes_cross_doc_boilerplate(docs):
    out = {r["doc_id"]: r for r in cd.corpus_line_dedup(docs).collect()}
    assert out[1]["text_dedup"] == "alpha beta\ngamma delta"
    assert out[1]["n_lines"] == 3 and out[1]["n_lines_removed"] == 1
    assert out[2]["text_dedup"] == "unique two line"
    # blank line survives (structure preserved, never counted)
    assert out[3]["text_dedup"] == "totally unique\n"
    assert out[4]["text_dedup"] == "one of a kind"
    assert out[4]["n_lines_removed"] == 0
    assert out[5]["text_dedup"] is None and out[5]["n_lines"] == 0
    assert out[6]["text_dedup"] == "" and out[6]["n_lines"] == 1
    # trimmed identity: padded variant removed, order of survivors kept
    assert out[7]["text_dedup"] == "kept here"
    assert 0.0 < out[1]["removed_char_frac"] < 1.0
    assert len(out) == docs.count()


def test_corpus_line_dedup_threshold(docs):
    # max_doc_freq=3: "subscribe now" (3 docs... plus doc 7's padded
    # variant -> 4 distinct docs) still removed; raise to 4 -> kept
    out3 = {r["doc_id"]: r for r in cd.corpus_line_dedup(docs, max_doc_freq=3).collect()}
    assert out3[1]["n_lines_removed"] == 1
    out4 = {r["doc_id"]: r for r in cd.corpus_line_dedup(docs, max_doc_freq=4).collect()}
    assert out4[1]["text_dedup"] == "alpha beta\nsubscribe now\ngamma delta"
    assert all(r["n_lines_removed"] == 0 for r in out4.values())


def test_word_ngrams(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a a a",), ("short",), ("",)], "t string"
    )
    got = cd.with_word_ngrams(df, "t", 2, "g").select("g").collect()
    assert sorted(got[0]["g"]) == ["a b", "b c", "c d"]
    assert got[1]["g"] == ["a a"]  # distinct collapses the repeat
    assert got[2]["g"] == [] and got[3]["g"] == []
    # non-distinct keeps every occurrence, in order
    raw = cd.with_word_ngrams(df, "t", 2, "g", distinct=False).select("g").collect()
    assert raw[1]["g"] == ["a a", "a a"]


def test_ngram_repetition_stats(spark):
    rows = [
        (1, "a b a b a"),  # 2-grams: {a b: 2, b a: 2} — tie -> lex max
        (2, "x y z"),      # all distinct
        (3, "w"),          # < n words
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cd.ngram_repetition_stats(df, n=2).collect()}
    assert out[1]["n_grams"] == 4
    assert out[1]["top_gram"] == "b a" and out[1]["top_gram_count"] == 2
    assert out[1]["top_gram_char_frac"] == pytest.approx(0.5)
    assert out[1]["dup_gram_char_frac"] == pytest.approx(1.0)
    assert out[2]["n_grams"] == 2 and out[2]["top_gram"] == "y z"
    assert out[2]["dup_gram_char_frac"] == 0.0
    assert out[3]["n_grams"] == 0 and out[3]["top_gram"] is None
    assert out[4]["n_grams"] == 0 and out[4]["top_gram_char_frac"] == 0.0
    assert len(out) == 4


def test_decontaminate_counts_and_flags(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares "the quick brown" etc.
            (2, "nothing in common here at all"),
            (3, "xx"),                            # < n words -> 0 grams
            (4, None),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox ran away",)], "text string"
    )
    out = {
        r["doc_id"]: r
        for r in cd.decontaminate(corpus, bench, n=3, min_matched_grams=2).collect()
    }
    # doc 1 grams: 3 of them; matched: "the quick brown", "quick brown fox"
    assert out[1]["n_grams"] == 3 and out[1]["n_matched_grams"] == 2
    assert out[1]["contaminated"] is True
    assert out[2]["n_matched_grams"] == 0 and out[2]["contaminated"] is False
    assert out[3]["n_grams"] == 0 and out[3]["contaminated"] is False
    assert out[4]["n_grams"] == 0 and out[4]["n_matched_grams"] == 0
    assert len(out) == 4


def test_corpus_line_dedup_plan_shape(spark, docs):
    """Plan lock: the line-frequency agg partial-aggregates map-side and
    the lines-to-dupset join is hash-based — no nested loop anywhere."""
    plan = (
        cd.corpus_line_dedup(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "partial_count(distinct" in plan or "partial_count" in plan


def test_decontaminate_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d e f g h i j")], "doc_id long, text string")
    bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
    plan = cd.decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_corpus_line_dedup_crlf(spark):
    """CRLF corpora: blank separator lines must never become countable
    '\\r' lines (which would be classified corpus-wide boilerplate and
    stripped from every doc), and identical content lines must match
    across CRLF and LF documents."""
    import pyspark.sql.functions as F

    from pdf_parser_spark.operators.corpus_dedup import corpus_line_dedup

    banner = "(c) MegaCorp all rights reserved"
    rows = [(i, f"unique line {i}\r\n\r\n{banner}\r") for i in range(4)]
    rows.append((99, f"unique line 99\n\n{banner}"))  # LF twin
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus_line_dedup(df, max_doc_freq=1).cache()

    # the banner is corpus-wide (5 docs > 1) in BOTH ending styles
    assert out.where(F.col("n_lines_removed") != 1).count() == 0
    texts = {r["doc_id"]: r["text_dedup"] for r in out.collect()}
    assert banner not in texts[99]
    assert banner not in texts[0]
    # blank lines survive — paragraph structure intact, CRLF or LF
    # (split on \n keeps the bare "\r" blank line; join restores it)
    assert texts[0] == "unique line 0\r\n\r"
    assert texts[99] == "unique line 99\n"
