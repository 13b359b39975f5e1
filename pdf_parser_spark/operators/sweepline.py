"""Sweep-line interval analytics — join-free "how many intervals are
open at each point" at fact×fact scale.

The naive plan for "count intervals [s, e] containing point t" is an
interval JOIN (points × intervals on s <= t <= e): Spark executes
that as a broadcast-nested-loop and the intermediate is |matches| —
at 10^12 rows either is fatal. The sweep-line identity

    open(t) = |{s : s <= t}| - |{e : e < t}|

turns it into ONE global ordering problem: union (+1 at every start,
-1 just after every end, 0 probes at points), order by (time, kind)
with starts < probes < ends at equal times, running-sum the deltas,
and read the sum at probe rows. No join, output rows == point rows.

The global running sum is the same corpus-scale hazard pack_sequences
solves (a bare Window.orderBy puts EVERYTHING in one task), so the
default path is the identical exact sharded prefix sum: sampled
range-repartition yields boundary (t, kind) values; every row's shard
is re-derived from those collected values (nothing depends on the
sampled partitioning); exact per-shard totals roll into offsets; a
bounded per-shard window finishes. `shards=None` opts into the single
window (oracle replay / tiny frames only).

Determinism: counts are exact integers; rows tying on (t, kind) are
either all probes (delta 0 — order can't matter) or all same-sign
deltas below every probe of that instant, so the result is
order-proof. Oracle: q80 replays the identity as two correlated
COUNT subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

_K_START, _K_PROBE, _K_END = 0, 1, 2


def open_interval_counts(
    points: DataFrame,
    intervals: DataFrame,
    id_col: str,
    point_col: str,
    start_col: str,
    end_col: str,
    out_col: str = "open_count",
    shards: int | str | None = "auto",
) -> DataFrame:
    """Per point-row: number of interval rows with start <= t <= end
    (inclusive both ends). Output: (id_col, out_col), one row per
    non-null-point input row; intervals with a null endpoint are
    ignored (mirror with IS NOT NULL in any SQL oracle)."""
    idt = points.schema[id_col].dataType
    p = points.where(F.col(point_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(point_col).alias("_t"),
        F.lit(_K_PROBE).alias("_k"),
        F.lit(0).cast("long").alias("_d"),
    )
    iv = intervals.where(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    s = iv.select(
        F.lit(None).cast(idt).alias("_id"),
        F.col(start_col).alias("_t"),
        F.lit(_K_START).alias("_k"),
        F.lit(1).cast("long").alias("_d"),
    )
    e = iv.select(
        F.lit(None).cast(idt).alias("_id"),
        F.col(end_col).alias("_t"),
        F.lit(_K_END).alias("_k"),
        F.lit(-1).cast("long").alias("_d"),
    )
    ev = p.unionByName(s).unionByName(e)

    if shards == "auto":
        shards = points.sparkSession.sparkContext.defaultParallelism
    if shards is None:
        w = Window.orderBy("_t", "_k").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        run = F.sum("_d").over(w)
        return (
            ev.withColumn("_run", run)
            .where(F.col("_k") == _K_PROBE)
            .select(F.col("_id").alias(id_col), F.col("_run").alias(out_col))
        )

    spark = points.sparkSession
    tt = p.schema["_t"].dataType
    # 1. boundary (t, kind) values from one sampled range partitioning;
    #    shard membership is re-derived from the VALUES, so the sampled
    #    partitioning itself is never load-bearing (pack_sequences'
    #    contract, same reasoning)
    ranged = ev.repartitionByRange(shards, "_t", "_k").withColumn(
        "_shard", F.spark_partition_id()
    )
    b_rows = ranged.groupBy("_shard").agg(
        F.min(F.struct("_t", "_k")).alias("b0")
    ).collect()
    bounds = sorted(
        ((r["b0"]["_t"], r["b0"]["_k"]) for r in b_rows if r["b0"] is not None)
    )
    b_schema = StructType(
        [
            StructField(
                "_bounds",
                ArrayType(
                    StructType(
                        [StructField("_t", tt), StructField("_k", IntegerType())]
                    )
                ),
            )
        ]
    )
    bdf = spark.createDataFrame([(bounds,)], b_schema)
    cur = F.struct(F.col("_t").alias("_t"), F.col("_k").alias("_k"))
    sharded = (
        ev.crossJoin(F.broadcast(bdf))  # 1-row broadcast, not a real cross
        .withColumn(
            "_shard",
            F.greatest(
                F.lit(0), F.size(F.filter(F.col("_bounds"), lambda b: b <= cur)) - 1
            ).cast("int"),
        )
        .drop("_bounds")
    )

    # 2. exact per-shard delta totals -> running offsets (S rows)
    totals = sharded.groupBy("_shard").agg(F.sum("_d").alias("_total")).collect()
    offsets, running = {}, 0
    for r in sorted(totals, key=lambda r: r["_shard"]):
        offsets[r["_shard"]] = running
        running += r["_total"]
    off_df = spark.createDataFrame(
        [(s_, o) for s_, o in offsets.items()],
        StructType(
            [StructField("_s", IntegerType()), StructField("_offset", LongType())]
        ),
    )

    # 3. bounded per-shard window cumsum + broadcast offset
    w = Window.partitionBy("_shard").orderBy("_t", "_k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        sharded.join(F.broadcast(off_df), F.col("_shard") == F.col("_s"))
        .withColumn("_run", F.sum("_d").over(w) + F.col("_offset"))
        .where(F.col("_k") == _K_PROBE)
        .select(F.col("_id").alias(id_col), F.col("_run").alias(out_col))
    )
