"""Mergeable distinct-count sketches (HyperLogLog) as DataFrame plans.

Why not approx_count_distinct: Spark's built-in HLL++ is a black-box
agg — you can't PERSIST the sketch, merge it across days/partitions,
or replay it in another engine. A 100 TB corpus wants a register
TABLE: per (group, register) rows that are (a) incrementally
mergeable by elementwise MAX (yesterday's registers ∪ today's = max),
(b) tiny (m rows per group), and (c) engine-portable. Flajolet et al.
2007; the register-table formulation follows the DataSketches /
BigQuery HLL++ "sketch as data" convention.

Determinism contract (the module's whole point): registers are exact
integers — hash (md5-portable or xxhash64), p low bits pick the
register, rho = leading-zero rank of the remaining bits via the
BIN-STRING LENGTH (integer, no log2), capped at 50 so the scaled
register sum Σ 2^(50-rho) stays an exact BIGINT. The raw estimate is
then ONE double expression over exact integers — bit-identical in any
IEEE engine that mirrors the expression text (oracle q79). The
bias-corrected estimate (linear counting under 2.5m) involves ln and
is production-only (pytest checks accuracy bounds, not bits).

  hll_register_table   (group, idx, rho) — the sketch, shuffle = one
                       groupBy(group, idx); scan-shaped before it
  hll_merge            elementwise max of two register tables
  hll_estimate         per-group raw + corrected estimates
  log2_histogram       mergeable order-of-magnitude value histogram
                       (≤ ~64 rows/group; merge = SUM; oracle q82)
  quantile_from_log2_histogram  bucket-midpoint quantile estimate
                       (factor-of-2 band — the sketch's honest error)

Scale notes: register table size is |groups| * m rows regardless of
input size — the groupBy's map-side partial MAX does the heavy
lifting, so the shuffle carries at most m rows per (group, mapper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text_metrics import portable_hash64

_RHO_CAP = 50  # keeps 2^(50-rho) integral and the register sum < 2^63


def hll_register_table(
    df: DataFrame,
    group_col: str,
    key_col: str,
    p: int = 12,
    portable: bool = False,
) -> DataFrame:
    """HLL sketch as data: one (group, idx, rho) row per non-empty
    register (m = 2^p registers; absent rows mean rho=0). portable=True
    uses the md5-derived 60-bit portable hash (ANSI-replayable, oracle
    q79); default xxhash64 (production, 64 usable bits)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p={p} out of range [4, 16]")
    m = 1 << p
    if portable:
        h = portable_hash64(F.col(key_col))  # 60 bits, non-negative
        w_bits = 60 - p
    else:
        # xxhash64 is signed; shiftrightunsigned makes the top bits
        # usable and keeps idx/rest non-negative
        h = F.shiftrightunsigned(F.xxhash64(F.col(key_col)), 1)  # 63 bits
        w_bits = 63 - p
    idx = h % F.lit(m)
    rest = F.shiftright(h, p)  # h >= 0, so arithmetic shift == floor div
    # rho = rank of the highest set bit from the top of the w_bits
    # window: integer-only via the bin-string length (no log2 doubles)
    rho = F.least(
        F.when(rest == 0, F.lit(w_bits + 1)).otherwise(
            F.lit(w_bits) - F.length(F.bin(rest)) + 1
        ),
        F.lit(_RHO_CAP),
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("group"), idx.alias("idx"), rho.alias("rho"))
        .groupBy("group", "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two register tables (same p): elementwise MAX — the HLL
    union. Associative/commutative/idempotent, so daily sketches roll
    up to monthly without touching raw data."""
    return (
        a.unionByName(b)
        .groupBy("group", "idx")
        .agg(F.max("rho").alias("rho"))
    )


def log2_histogram(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Mergeable order-of-magnitude histogram — the quantile-sketch
    sibling of the HLL register table. One (group, bucket, cnt, lo,
    hi) row per non-empty power-of-two bucket: bucket b =
    bit_length(floor(v)) for v >= 1 (so values in [2^(b-1), 2^b)),
    bucket 0 collects v < 1 (including negatives — bound callers
    filter first). At most ~64 rows per group regardless of input;
    merge = SUM of cnt on (group, bucket); bit_length via the
    bin-string trick keeps everything integer/deterministic (oracle
    q82). Null values are ignored."""
    v = F.floor(F.col(value_col)).cast("long")
    bucket = F.when(v <= 0, F.lit(0)).otherwise(F.length(F.bin(v)))
    lo = F.when(F.col("bucket") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("shiftleft(cast(1 as bigint), bucket - 1)")
    )
    hi = F.when(F.col("bucket") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("shiftleft(cast(1 as bigint), bucket) - 1")
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("group"), bucket.alias("bucket"))
        .groupBy("group", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("lo", lo)
        .withColumn("hi", hi)
    )


def log2_histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two histograms (same value domain): SUM counts per
    (group, bucket) — associative/commutative, cross-day rollup."""
    return (
        a.unionByName(b)
        .groupBy("group", "bucket")
        .agg(F.sum("cnt").alias("cnt"), F.min("lo").alias("lo"), F.min("hi").alias("hi"))
    )


def quantile_from_log2_histogram(hist: DataFrame, q: float) -> DataFrame:
    """Per-group quantile ESTIMATE from the histogram: the midpoint of
    the first bucket whose cumulative count reaches ceil(q * total).
    Error is bounded by the bucket (a factor-of-2 band) — the honest
    contract of an order-of-magnitude sketch. Window partitions are
    bounded (<= ~64 buckets/group)."""
    if not 0.0 < q <= 1.0:
        raise ValueError("q in (0, 1]")
    from pyspark.sql import Window

    w = Window.partitionBy("group").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("group")
    need = F.ceil(F.lit(q) * F.sum("cnt").over(wt)).cast("long")
    cum = F.sum("cnt").over(w)
    return (
        hist.withColumn("_cum", cum)
        .withColumn("_need", need)
        .where(F.col("_cum") >= F.col("_need"))
        .groupBy("group")
        .agg(F.min(F.struct("bucket", "lo", "hi")).alias("b"))
        .select(
            "group",
            F.col("b.bucket").alias("bucket"),
            ((F.col("b.lo").cast("double") + F.col("b.hi")) / F.lit(2.0)).alias(
                "estimate"
            ),
        )
    )


def hll_estimate(registers: DataFrame, p: int = 12, corrected: bool = True) -> DataFrame:
    """Per-group cardinality estimate from a register table.

    Output: (group, registers_set, sum_scaled, raw_est[, est]).
    raw_est = alpha_m * m^2 / Σ 2^-rho with the sum carried as the
    exact integer Σ 2^(50-rho) — deterministic to the bit. est adds
    the standard small-range linear-counting correction (uses ln —
    production only, excluded from the bitwise oracle)."""
    m = 1 << p
    # pyspark's shiftleft wrapper wants an int numBits; the SQL form
    # takes a column expression
    scaled = F.expr(f"shiftleft(cast(1 as bigint), {_RHO_CAP} - rho)")
    per_group = registers.groupBy("group").agg(
        F.count("*").alias("registers_set"),
        F.sum(scaled).alias("present_scaled"),
    )
    # empty registers contribute 2^-0 = 1 each -> 2^50 scaled
    sum_scaled = (
        F.col("present_scaled")
        + (F.lit(m).cast("long") - F.col("registers_set")) * F.shiftleft(F.lit(1).cast("long"), _RHO_CAP)
    )
    alpha_num = 0.7213  # alpha_m = 0.7213/(1 + 1.079/m), valid m >= 128
    raw = (
        F.lit(alpha_num)
        / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << _RHO_CAP))
        / sum_scaled.cast("double")
    )
    out = per_group.select(
        "group",
        "registers_set",
        sum_scaled.alias("sum_scaled"),
        F.round(raw, 4).alias("raw_est"),
    )
    if not corrected:
        return out
    zeros = F.lit(m) - F.col("registers_set")
    est = F.when(
        (F.col("raw_est") <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(F.col("raw_est"))
    return out.withColumn("est", F.round(est, 4))
