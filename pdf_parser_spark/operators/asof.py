"""Scalable as-of join (merge_asof semantics) via union + window.

Spark has no native as-of join; the pandas-on-Spark merge_asof
broadcasts ranges. This operator is the shuffle-shaped classic that
scales to fact-x-fact sizes:

  1. tag both inputs and UNION them on a common (by, ts, side,
     payload) shape — no join materialization at all;
  2. one window per group key ordered by (ts, side, tiebreak):
     last(payload, ignorenulls) over the unbounded-preceding frame
     carries the most recent right-side payload forward;
  3. keep the left-side rows.

Cost: ONE shuffle of |left|+|right| rows hashed on the group key —
compare a range-join's pair blowup. Ties: side orders right rows
BEFORE left rows at equal ts (backward-inclusive semantics), and the
tiebreak column makes the carried payload deterministic when several
right rows share (by, ts) — the max-tiebreak row wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: Column,
    right_ts: Column,
    payload: Column,
    payload_name: str = "asof_value",
) -> DataFrame:
    """Left rows + the payload of the latest right row with
    right_ts <= left_ts in the same `by` group (null when none).
    `left_ts`/`right_ts` must be monotone-comparable (cast timestamps
    to unix micros upstream for exactness); `payload` must be orderable
    — it doubles as the deterministic tiebreak at equal ts."""
    l_tagged = left.select(
        F.col(by),
        left_ts.alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_pl"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    r_tagged = right.select(
        F.col(by),
        right_ts.alias("_ts"),
        F.lit(0).alias("_side"),
        payload.cast("long").alias("_pl"),
        F.lit(None).cast(l_tagged.schema["_row"].dataType).alias("_row"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(by)
        .orderBy("_ts", "_side", "_pl")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(payload_name, F.last("_pl", ignorenulls=True).over(w))
    return (
        carried.where(F.col("_side") == 1)
        .select(F.col("_row.*"), F.col(payload_name))
    )
