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
  cms_table            count-min sketch (Cormode & Muthukrishnan 2005)
                       as a (group, row, col, cnt) counter table —
                       frequency sibling of the HLL register table
                       (≤ d*w rows/group; merge = SUM; oracle q83)
  cms_merge            elementwise SUM of two counter tables
  cms_lookup           point-frequency estimates for a probe frame
                       (min over d counters; never underestimates)
  bloom_table          Bloom filter (Bloom 1970) as a (group, pos)
                       set-bit table — membership sibling
                       (≤ m rows/group; merge = distinct ∪; oracle q84)
  bloom_merge          set union of two bit tables
  bloom_contains       broadcast membership probe for a corpus frame
                       (no false negatives; probes never shuffle)

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
    # Flajolet et al. 2007 §4: the asymptotic alpha_m = 0.7213/(1 +
    # 1.079/m) only holds for m >= 128; the small register counts the
    # table admits (p=4..6) have their own tabulated constants — using
    # the asymptotic formula there biases every estimate.
    small_alpha = {16: 0.673, 32: 0.697, 64: 0.709}
    if m in small_alpha:
        alpha = F.lit(small_alpha[m])
    else:
        alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = (
        alpha
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


def _cms_coords(key, d: int, w: int, portable: bool):
    """Array of d (row, col) structs for a key — one counter
    coordinate per hash row. Hash rows are independent by seed:
    portable uses the md5-derived 60-bit hash with seed=i (DuckDB
    replays it — oracle q83); production uses xxhash64(key, i)."""
    coords = []
    for i in range(d):
        if portable:
            h = portable_hash64(key, seed=i)
        else:
            h = F.shiftrightunsigned(F.xxhash64(key, F.lit(i)), 1)
        coords.append(
            F.struct(F.lit(i).alias("row"), (h % F.lit(w)).alias("col"))
        )
    return F.array(*coords)


def cms_table(
    df: DataFrame,
    group_col: str,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """Count-min sketch as data: one (group, row, col, cnt) row per
    non-empty counter (d hash rows x w columns; absent rows mean 0).
    The explode multiplies input rows by d BEFORE the groupBy, but the
    map-side partial SUM collapses them locally, so the shuffle
    carries at most d*w rows per (group, mapper) — the counter table
    is <= |groups|*d*w rows regardless of input size, hence always
    broadcastable. Merge across days/partitions = cms_merge (SUM);
    point estimate = cms_lookup (MIN over the d counters) with the
    classic one-sided guarantee: est >= true count, overestimate
    bounded by eps = e/w of the group's total mass w.p. 1 - e^-d."""
    if d < 1 or d > 16:
        raise ValueError(f"d={d} out of range [1, 16]")
    if w < 2:
        raise ValueError(f"w={w} must be >= 2")
    rc = F.explode(_cms_coords(F.col(key_col), d, w, portable)).alias("rc")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("group"), rc)
        .select(
            "group",
            F.col("rc.row").alias("row"),
            F.col("rc.col").alias("col"),
        )
        .groupBy("group", "row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two counter tables (same d, w): elementwise SUM — CMS is
    a linear sketch, so union = addition. Associative/commutative;
    daily sketches roll up to monthly without raw-data re-reads."""
    return (
        a.unionByName(b)
        .groupBy("group", "row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    portable: bool = False,
    validate: bool = True,
) -> DataFrame:
    """Point-frequency estimates: one output row per probe row (the
    probe frame's `group` column + key_col pick the counters), est =
    MIN over the d counters the key hashes to. Implemented as d
    chained broadcast left joins — one per hash row, each against the
    bounded (<= |groups|*d*w rows by construction) sketch side — so
    the probe frame NEVER shuffles: no explode (rows don't multiply),
    no groupBy (duplicate probe rows stay distinct rows). Keys the
    sketch never saw read their counters as 0 via the joins'
    coalesce.

    `validate` (ADVICE r4): probe params MUST match the build's — a
    mismatch silently breaks the one-sided est >= true guarantee (a
    probe row hashing to a row/col the build never produced reads 0).
    The structural check is one tiny agg on the bounded sketch side:
    a non-empty build populates every hash row, so max(row) == d-1
    exactly, and every col < w. w_build < w_probe is structurally
    invisible (all cols < w_build < w) — persist build params (the
    profile job's _profile_meta.json pattern) for full protection."""
    if validate:
        hdr = sketch.agg(
            F.max("row").alias("mr"), F.max("col").alias("mc")
        ).first()
        if hdr["mr"] is not None and (hdr["mr"] != d - 1 or hdr["mc"] >= w):
            raise ValueError(
                f"cms_lookup params (d={d}, w={w}) do not match the sketch "
                f"(max row {hdr['mr']} != d-1, or max col {hdr['mc']} >= w); "
                "probe with the build's params"
            )
    keep = list(probes.columns)
    out = probes
    for i in range(d):
        if portable:
            h = portable_hash64(F.col(key_col), seed=i)
        else:
            h = F.shiftrightunsigned(F.xxhash64(F.col(key_col), F.lit(i)), 1)
        side = (
            sketch.where(F.col("row") == i)
            .select("group", F.col("col").alias(f"_pos{i}"), F.col("cnt").alias(f"_cnt{i}"))
        )
        out = out.withColumn(f"_pos{i}", h % F.lit(w)).join(
            F.broadcast(side), ["group", f"_pos{i}"], "left"
        ).drop(f"_pos{i}")
    est = F.least(
        *[F.coalesce(F.col(f"_cnt{i}"), F.lit(0).cast("long")) for i in range(d)]
    )
    return out.select(*keep, est.alias("est"))


def _bloom_positions(key, k: int, m: int, portable: bool):
    """Array of k bit positions for a key (one per seeded hash). Same
    seed-independence scheme as the CMS coords: portable = md5-derived
    60-bit hash with seed=i (DuckDB replays it — oracle q84);
    production = xxhash64(key, i)."""
    pos = []
    for i in range(k):
        if portable:
            h = portable_hash64(key, seed=i)
        else:
            h = F.shiftrightunsigned(F.xxhash64(key, F.lit(i)), 1)
        pos.append(h % F.lit(m))
    return F.array(*pos)


def bloom_table(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 4,
    m: int = 8192,
    portable: bool = False,
) -> DataFrame:
    """Bloom filter as data (Bloom 1970): one (group, pos) row per SET
    bit of an m-bit array with k hashes per key; absent rows mean 0.
    Membership sibling of the HLL register table (distinct), the CMS
    counter table (frequency), and the log2 histogram (quantiles) —
    same mergeable-sketch-as-DataFrame convention. The k-way explode
    happens before the groupBy, and the map-side partial collapses
    duplicate bits locally, so the shuffle carries at most m rows per
    (group, mapper); the bit table is <= |groups|*m rows at ANY input
    size, hence always broadcastable. Canonical 100 TB use: build the
    filter over a benchmark/blocklist key set once, broadcast it, and
    probe the full corpus map-side (decontamination, URL-seen checks)
    with the classic one-sided guarantee — NO false negatives; false
    positive rate ~(1 - e^(-kn/m))^k."""
    if not 1 <= k <= 16:
        raise ValueError(f"k={k} out of range [1, 16]")
    if m < 2:
        raise ValueError(f"m={m} must be >= 2")
    pos = F.explode(_bloom_positions(F.col(key_col), k, m, portable)).alias("pos")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("group"), pos)
        .groupBy("group", "pos")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two bit tables (same k, m): set union = distinct union of
    the set-bit rows. Associative/commutative; daily blocklist filters
    roll up without re-reading raw keys."""
    return a.unionByName(b).distinct()


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    k: int = 4,
    m: int = 8192,
    portable: bool = False,
    validate: bool = True,
) -> DataFrame:
    """Membership probe: for each probe row (must carry a `group`
    column + key_col), maybe_member = ALL k bit positions set. The
    bloom side is broadcast (bounded at |groups|*m rows by
    construction), so the probe is k chained map-side hash joins —
    one per hash position; the corpus frame never shuffles, never
    explodes, and duplicate probe rows stay distinct output rows.
    One-sided: a key that was inserted ALWAYS reads true (no false
    negatives); an absent key reads true only if all k of its
    positions collide with set bits.

    `validate` (ADVICE r4): an m mismatch silently turns the no-false-
    negatives guarantee into false negatives (probed positions the
    build never produced). One tiny agg on the bounded bit table
    catches m_probe <= max set bit; k and m_build < m_probe leave no
    structural trace in a (group, pos) table — persist build params
    (the profile job's _profile_meta.json pattern) for full
    protection."""
    if validate:
        hdr = bloom.agg(F.max("pos").alias("mp")).first()
        if hdr["mp"] is not None and hdr["mp"] >= m:
            raise ValueError(
                f"bloom_contains m={m} does not match the filter "
                f"(max set bit {hdr['mp']} >= m); probe with the build's m"
            )
    keep = list(probes.columns)
    out = probes
    for i in range(k):
        if portable:
            h = portable_hash64(F.col(key_col), seed=i)
        else:
            h = F.shiftrightunsigned(F.xxhash64(F.col(key_col), F.lit(i)), 1)
        side = bloom.select(
            "group", F.col("pos").alias(f"_pos{i}"), F.lit(1).alias(f"_hit{i}")
        )
        out = out.withColumn(f"_pos{i}", h % F.lit(m)).join(
            F.broadcast(side), ["group", f"_pos{i}"], "left"
        ).drop(f"_pos{i}")
    member = F.lit(True)
    for i in range(k):
        member = member & F.col(f"_hit{i}").isNotNull()
    return out.select(*keep, member.alias("maybe_member"))
