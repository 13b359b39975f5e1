"""Training-sample shaping: token-window chunking + sequence packing.

The last mile of an LLM data pipeline — documents become fixed-budget
training samples:

  token_chunks     sliding word-window chunks (size, overlap) per
                   document: explode over chunk indices + array slice,
                   all codegen'd, rows ∝ chunks (never ∝ words)
  pack_sequences   assign documents to fixed-token-budget training
                   sequences via a cumulative-sum window within a
                   group (the deterministic, shuffle-light analogue of
                   greedy concat-and-pack; a document that straddles a
                   boundary opens the next sequence rather than being
                   split — documented, SQL-replayable semantics)

Scale notes: token_chunks shuffles nothing; pack_sequences is one
window shuffle on the group key. Both are ANSI-replayable (q62/q63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text_metrics import token_count, word_array


def token_chunks(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): words [k*stride, k*stride+size) with
    stride = size - overlap. Documents shorter than one stride yield a
    single chunk; empty documents yield none."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    words = word_array(F.col(text_col))
    n = token_count(F.col(text_col))
    base = df.select(
        F.col(key_col).alias("url"), words.alias("ws"), n.alias("n")
    ).where(F.col("n") > 0)
    n_chunks = F.ceil(F.col("n") / F.lit(stride)).cast("int")
    exploded = base.select(
        "url",
        "n",
        "ws",
        F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias("chunk_no"),
    )
    start = F.col("chunk_no") * stride
    cnt = F.least(F.lit(size), F.col("n") - start)
    return exploded.select(
        "url",
        "chunk_no",
        cnt.cast("int").alias("n_words"),
        F.element_at("ws", (start + 1).cast("int")).alias("first_word"),
        F.element_at("ws", (start + cnt).cast("int")).alias("last_word"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    by: str = "lang",
    budget: int = 2048,
    shards: int | str | None = "auto",
) -> DataFrame:
    """Assign each document to a training sequence id: documents are
    taken in deterministic (key) order within each group, and a
    document starts in the sequence its cumulative predecessor mass
    lands in — seq_id = floor(tokens_before / budget).

    The group key of a packing run is usually LOW cardinality (a
    handful of languages), and a plain Window.partitionBy puts an
    entire group in ONE task: the corpus-scale hazard. The DEFAULT
    (`shards="auto"`, resolved to the session's defaultParallelism)
    therefore runs an exact distributed prefix sum; `shards=None`
    opts into the single whole-group window (only sensible for tiny
    frames or oracle replay):

      1. range-repartition on (by, key) into S ordered shards;
      2. per-(group, shard) local cumsum — bounded window partitions;
      3. per-(group, shard) totals (S·|groups| tiny rows) collected
         once, turned into per-shard offsets, broadcast back.

    The result is IDENTICAL to the single-window form for any shard
    boundary placement (offsets absorb wherever sampling cuts the
    ranges), so the scalable path needs no semantic caveats.
    """
    toks = token_count(F.col(text_col))
    base = df.select(F.col(by), F.col(key_col), toks.alias("tokens"))
    if shards == "auto":
        shards = df.sparkSession.sparkContext.defaultParallelism
    if shards is None:
        w = Window.partitionBy(by).orderBy(key_col)
        cum = F.sum("tokens").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        before = cum - F.col("tokens")
        return base.select(
            by,
            key_col,
            "tokens",
            F.floor(before / F.lit(budget)).cast("bigint").alias("seq_id"),
        )

    ranged = base.repartitionByRange(shards, F.col(by), F.col(key_col)).withColumn(
        "_shard", F.spark_partition_id()
    )
    w = Window.partitionBy(by, "_shard").orderBy(key_col)
    local = ranged.withColumn(
        "_local_before",
        F.sum("tokens").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col("tokens"),
    )
    # persist before the two consumers: range boundaries come from
    # SAMPLING, and recomputing the frame for the second action could
    # re-draw them — totals and local cumsums must see ONE partitioning
    local = local.persist()
    totals = (
        local.groupBy(by, "_shard")
        .agg(F.sum("tokens").alias("_total"))
        .collect()
    )
    offsets: dict[tuple, int] = {}
    running: dict[object, int] = {}
    for r in sorted(totals, key=lambda r: (r[by], r["_shard"])):
        g = r[by]
        offsets[(g, r["_shard"])] = running.get(g, 0)
        running[g] = running.get(g, 0) + r["_total"]
    # offsets schema mirrors the ACTUAL group-key dtype (an int lang
    # id must not be round-tripped through string, or the broadcast
    # join below mis-keys)
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    spark = df.sparkSession
    off_schema = StructType(
        [
            StructField(by, base.schema[by].dataType),
            StructField("_shard", IntegerType()),
            StructField("_offset", LongType()),
        ]
    )
    off_df = spark.createDataFrame(
        [(g, s, o) for (g, s), o in offsets.items()], off_schema
    )
    before = F.col("_local_before") + F.col("_offset")
    return (
        local.join(F.broadcast(off_df), on=[by, "_shard"])
        .select(
            by,
            key_col,
            "tokens",
            F.floor(before / F.lit(budget)).cast("bigint").alias("seq_id"),
        )
    )
