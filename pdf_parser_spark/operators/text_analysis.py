"""Document-level text analysis stages (training-data pipeline tier).

Thin DataFrame stages over functions/text_metrics — all native exprs,
one scan, no shuffle until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text_metrics as tm


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts, quality ratios, fingerprint, language guess."""
    c = F.col(text_col)
    return (
        df.withColumn("tokens", tm.token_count(c))
        .withColumn("tokens_bpe", tm.bpe_ish_token_count(c))
        .withColumn("punct_ratio", tm.punct_ratio(c))
        .withColumn("mean_word_len", tm.mean_word_length(c))
        .withColumn("stopword_ratio", tm.stopword_ratio(c))
        .withColumn("quality", tm.quality_score(c))
        .withColumn("fingerprint", tm.fingerprint(c))
        .withColumn("lang_guess", tm.language_guess(c))
    )


def quality_summary(df: DataFrame, text_col: str = "text", by: str = "lang") -> DataFrame:
    """Per-group quality/token rollup (single hash agg).

    Determinism: double AVGs wobble with Spark's partial-agg order, so
    every average is an exact integer SUM followed by ONE double
    division. The punct ratio is quantized per row to an integer 1e-9
    grid (ROUND(punct*1e9/total)) before summing — per-row double math
    is order-free and bit-identical across engines.
    """
    c = F.col(text_col)
    total = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    pr_e9 = (
        F.when(total == 0, F.lit(0.0))
        .otherwise(F.round(punct.cast("double") * F.lit(1000000000.0) / total))
        .cast("long")
    )
    feats = df.select(
        F.col(by),
        tm.token_count(c).alias("tokens"),
        tm.quality_points(c).alias("qpoints"),
        pr_e9.alias("pr_e9"),
        tm.fingerprint(c).alias("fingerprint"),
    )
    n = F.count("*")
    return feats.groupBy(by).agg(
        n.alias("docs"),
        (F.round(F.sum("tokens").cast("double") / n, 4) + F.lit(0.0)).alias("avg_tokens"),
        (F.round(F.sum("qpoints").cast("double") / (n * F.lit(3.0)), 4) + F.lit(0.0)).alias(
            "avg_quality"
        ),
        (
            F.round(F.sum("pr_e9").cast("double") / n / F.lit(1000000000.0), 4) + F.lit(0.0)
        ).alias("avg_punct_ratio"),
        F.countDistinct("fingerprint").alias("distinct_texts"),
    )
