"""Corpus keyword retrieval — BM25-family scoring, scan-shaped.

A training-data engine needs "find the docs about X" over billions of
rows without an inverted-index service: score every doc for a SMALL
fixed term set and TakeOrderedAndProject the top k. The plan is
scan-shaped: per-doc term frequencies are array-filter counts over a
hoisted word array (no explode — rows never multiply), the corpus
statistics (N, Σdl, per-term document frequencies) are ONE aggregate
row broadcast back, and the ranking is the no-global-sort top-k. The
tokenized stats projection is computed twice by default (once under
the corpus aggregate, once in the scored branch); `cache_stats=True`
persists it instead — see keyword_topk for the tradeoff.

Determinism (the oracle story, q81): classic BM25 idf is
ln((N-df+0.5)/(df+0.5)+1) and ln is not bit-portable across engines.
The default here scores with the RATIONAL Robertson odds
(N-df+0.5)/(df+0.5), so every arithmetic step is IEEE-exact given
identical inputs and a DuckDB replay matches bit-for-bit. Caveat,
stated plainly: per term the odds are a monotone transform of the ln
idf, so SINGLE-term rankings agree with classic BM25 exactly — but a
sum of per-term monotone transforms is not itself monotone, so
MULTI-term rankings can differ from textbook BM25 when the query
mixes rare and common terms (the odds weight rare terms much more
steeply than ln does). The default is therefore a BM25-FAMILY scorer
chosen for bit-portability, not a bit-portable reproduction of
classic BM25; pass `classic=True` for the textbook ln idf
(production-only, pytest-ranked not bit-checked). Term-frequency
saturation is standard BM25: tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def keyword_topk(
    df: DataFrame,
    terms: "list[str]",
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    classic: bool = False,
    cache_stats: bool = False,
) -> DataFrame:
    """Top-k docs for a bag-of-terms query. Output: (key, score, dl,
    tf_<i> per term), ordered by (score desc, key) — the tiebreak
    makes the cut deterministic. Terms are matched as exact lowercase
    whitespace tokens (mirror the tokenization in any oracle).

    cache_stats: the tokenized per-doc stats frame feeds BOTH the
    corpus aggregate and the scored branch, so by default the
    (dominant) tokenization work runs twice. True persists the narrow
    stats frame (key + 1+|terms| ints per row) between the passes —
    wins when the frame fits memory or when text rows are much wider
    than the stats row (~40 bytes); at 10^12 rows the spill write+read
    is comparable to re-tokenizing, so it stays opt-in. The frame is
    left cached for Spark's LRU (top-k output is tiny; there is no
    post-action hook to unpersist from inside a lazy plan)."""
    if not terms:
        raise ValueError("terms must be non-empty")
    c = F.coalesce(F.col(text_col), F.lit(""))
    base = df.withColumn(
        "__ws", F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda x: x != "")
    )
    ws = F.col("__ws")
    # NB: a default-arg lambda has arity 2 and pyspark would bind the
    # second param to the ARRAY INDEX form of filter — a factory keeps
    # the per-term literal in a real closure with a 1-arg lambda
    def _tf(term_lit):
        return F.size(F.filter(ws, lambda x: x == term_lit))

    sel = [F.col(key_col), F.size(ws).alias("dl")]
    for i, t in enumerate(terms):
        sel.append(_tf(F.lit(t.lower())).alias(f"tf_{i}"))
    stats = base.select(*sel)
    if cache_stats:
        from pyspark import StorageLevel

        stats = stats.persist(StorageLevel.MEMORY_AND_DISK)

    aggs = [F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")]
    for i in range(len(terms)):
        aggs.append(
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
        )
    corpus = stats.agg(*aggs)

    scored = stats.crossJoin(F.broadcast(corpus))  # 1-row broadcast
    avgdl = F.col("sdl").cast("double") / F.col("n")
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}")
        dfq = F.col(f"df_{i}")
        if classic:
            idf = F.log(
                (F.col("n") - dfq + F.lit(0.5)) / (dfq + F.lit(0.5)) + F.lit(1.0)
            )
        else:
            idf = (F.col("n") - dfq + F.lit(0.5)) / (dfq + F.lit(0.5))
        tfnorm = (tf * F.lit(k1 + 1.0)) / (
            tf
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )
        score = score + idf * tfnorm
    out = scored.select(
        key_col,
        score.alias("score"),
        "dl",
        *[F.col(f"tf_{i}") for i in range(len(terms))],
    )
    return out.orderBy(F.desc("score"), F.col(key_col)).limit(k)
