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

      1. one sampled range-repartition yields S·|groups| contiguous
         boundary KEYS (collected; tiny) — every row's shard is then
         re-derived from the boundary values, so nothing downstream
         depends on the sampled partitioning (no persist, no pinned
         cache);
      2. exact per-(group, shard) totals over that deterministic
         assignment → per-shard offsets, broadcast back;
      3. per-(group, shard) local cumsum — bounded window partitions
         — plus the offset.

    The result is IDENTICAL to the single-window form for any shard
    boundary placement (offsets absorb wherever the boundaries fall),
    so the scalable path needs no semantic caveats.
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

    # 1. derive contiguous per-group boundary KEYS from one sampled
    #    range partitioning. Any sampling outcome is a valid contiguous
    #    split (balance affects speed, never values); determinism and
    #    exactness come from re-deriving every row's shard from these
    #    collected boundary VALUES below — so nothing downstream
    #    depends on the sampled partitioning and NO persist is needed
    #    (the r3 review caught the previous persist pinning a
    #    corpus-sized cache for the session lifetime).
    ranged = base.repartitionByRange(shards, F.col(by), F.col(key_col)).withColumn(
        "_shard", F.spark_partition_id()
    )
    bounds_rows = (
        ranged.groupBy(by, "_shard").agg(F.min(key_col).alias("k0")).collect()
    )
    per_group: dict[object, list] = {}
    for r in bounds_rows:
        per_group.setdefault(r[by], []).append(r["k0"])
    for ks in per_group.values():
        ks.sort()

    from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

    spark = df.sparkSession
    # schemas mirror the ACTUAL group-key/doc-key dtypes (an int lang
    # id must not be round-tripped through string, or the broadcast
    # joins mis-key)
    b_schema = StructType(
        [
            StructField(by, base.schema[by].dataType),
            StructField("_bounds", ArrayType(base.schema[key_col].dataType)),
        ]
    )
    bdf = spark.createDataFrame(
        [(g, ks) for g, ks in per_group.items()], b_schema
    )
    key = F.col(key_col)
    # NULL-SAFE join: a null group key is a real group (the window path
    # and SQL PARTITION BY both keep it); a plain equi-join would
    # silently drop those rows from the packed output
    bdfr = bdf.withColumnRenamed(by, "_g")
    sharded = (
        base.join(F.broadcast(bdfr), F.col(by).eqNullSafe(F.col("_g")))
        .drop("_g")
        .withColumn(
            "_shard",
            (F.size(F.filter(F.col("_bounds"), lambda b: b <= key)) - 1).cast("int"),
        )
        .drop("_bounds")
    )

    # 2. exact per-(group, shard) totals over the deterministic
    #    assignment (one extra scan instead of a pinned cache — the
    #    right trade at corpus scale), rolled into per-shard offsets
    totals = (
        sharded.groupBy(by, "_shard").agg(F.sum("tokens").alias("_total")).collect()
    )
    offsets: dict[tuple, int] = {}
    running: dict[object, int] = {}
    # only the per-group shard ORDER matters; sorting by shard alone
    # keeps it ascending within every group and never compares group
    # keys (a null group key would make a (g, shard) sort raise)
    for r in sorted(totals, key=lambda r: r["_shard"]):
        g = r[by]
        offsets[(g, r["_shard"])] = running.get(g, 0)
        running[g] = running.get(g, 0) + r["_total"]
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

    # 3. bounded per-(group, shard) window cumsum + broadcast offsets
    w = Window.partitionBy(by, "_shard").orderBy(key_col)
    local_before = (
        F.sum("tokens").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col("tokens")
    )
    before = local_before + F.col("_offset")
    offr = off_df.withColumnRenamed(by, "_g").withColumnRenamed("_shard", "_s")
    return (
        sharded.join(
            F.broadcast(offr),
            F.col(by).eqNullSafe(F.col("_g")) & (F.col("_shard") == F.col("_s")),
        )
        .select(
            by,
            key_col,
            "tokens",
            F.floor(before / F.lit(budget)).cast("bigint").alias("seq_id"),
        )
    )
