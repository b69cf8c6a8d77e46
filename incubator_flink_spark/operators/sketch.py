"""Fixed-memory sketches: count-min (frequency estimation, Cormode &
Muthukrishnan 2005) and HyperLogLog (distinct counting, Flajolet et al.
2007).  The reference has no sketch operators (beyond-reference scope);
these give the engine summaries whose size is independent of corpus
cardinality.  Unlike Spark's built-in ``approx_count_distinct``, this
HLL is deterministic AND integer-exact in its registers, so a SQL oracle
reproduces the estimate bit-for-bit.

Scale shape (100 TB):
- every item is reduced to its 60-bit ``hash64`` map-side, then mapped to
  ``depth`` (row, bucket) cells with seeded universal hashes — the
  groupBy on (row, bucket) is map-side combined, so each task emits at
  most depth*width cells regardless of input size, and the merged sketch
  is depth*width rows total (mergeability is the point of the sketch:
  per-partition partial sketches sum cell-wise, which IS Spark's partial
  aggregation);
- estimation joins query keys against the tiny sketch via broadcast.

Determinism: the hash coefficients are fixed (seeded) and the arithmetic
is integer-only, so the sketch — including its overestimates — is a pure
function of the input and reproducible in the DuckDB oracle.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_flink_spark.functions.hashing import (
    P,
    hash64,
    hash64_sql,
    universal_bucket,
    universal_bucket_sql,
)

CMS_DEPTH = 4
CMS_WIDTH = 512

_rng = random.Random(271828)
CMS_AB = [(_rng.randrange(1, P), _rng.randrange(0, P)) for _ in range(CMS_DEPTH)]


def cms_bucket(h: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Bucket of base-hash ``h`` in sketch row ``row`` (the shared
    seeded universal-hash family in functions/hashing.py)."""
    a, b = CMS_AB[row]
    return universal_bucket(h, a, b, width)


def cms_bucket_sql(hexpr: str, row: int, width: int = CMS_WIDTH) -> str:
    a, b = CMS_AB[row]
    return universal_bucket_sql(hexpr, a, b, width)


def cms_build(
    items: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, cell): the sketch as a depth*width-row table.

    Each input item contributes ``weight`` (default 1) to one cell per
    row.  The explode-to-depth-rows + groupBy is the mergeable-partial
    formulation: map-side combine caps every task's shuffle output at
    depth*width cells."""
    h = hash64(F.col(key_col))
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("row"), cms_bucket(h, r, width).alias("bucket"))
            for r in range(depth)
        ]
    )
    return (
        items.select(w.alias("__w"), F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cell"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """keys + (est): point-query estimates, the classic min over rows.

    The sketch is depth*width rows — broadcast it; the probe explodes each
    key to its depth cells and takes the min matched cell (a missing cell
    means zero hits landed there, so the estimate is 0)."""
    h = hash64(F.col(key_col))
    probes = F.array(
        *[
            F.struct(F.lit(r).alias("row"), cms_bucket(h, r, width).alias("bucket"))
            for r in range(depth)
        ]
    )
    probed = keys.select(*keys.columns, F.explode(probes).alias("rb")).select(
        *keys.columns, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    joined = probed.join(F.broadcast(sketch), ["row", "bucket"], "left").withColumn(
        "__cell", F.coalesce(F.col("cell"), F.lit(0))
    )
    return joined.groupBy(*keys.columns).agg(F.min("__cell").alias("est"))


# --- HyperLogLog --------------------------------------------------------------
#
# Register machinery is INTEGER-ONLY so Spark and DuckDB agree exactly:
# - bucket = low 8 bits of the 60-bit base hash; w = the remaining bits;
# - rho(w) = 1 + number of trailing zero bits of w, extracted via the
#   binary-string representation (bin/rtrim — portable, no log2 whose
#   last-ulp behavior differs between libm implementations), capped;
# - the harmonic denominator sum(2^-M_j) is scaled by 2^RHO_CAP into an
#   exact int64 (max term 2^40, 256 buckets => < 2^48, no overflow);
# - the only float op is ONE division of two exact values by an inlined
#   shared constant — deterministic IEEE, identical in both engines.

HLL_M = 256  # buckets (b = 8 index bits)
HLL_RHO_CAP = 40
# alpha_m * m^2 * 2^RHO_CAP for m=256 — inlined into both engines so the
# final estimate is the same single IEEE division everywhere.
HLL_ALPHA_M = 0.7213 / (1 + 1.079 / HLL_M)
HLL_NUM = repr(HLL_ALPHA_M * HLL_M * HLL_M * float(2**HLL_RHO_CAP))


def _rho(w: Column) -> Column:
    """1 + trailing-zero count of ``w`` (> 0), capped at HLL_RHO_CAP."""
    b = F.bin(w)
    tz = F.length(b) - F.length(F.regexp_replace(b, "0+$", ""))
    return F.least(F.lit(HLL_RHO_CAP), tz + F.lit(1))


def hll_registers(items: DataFrame, key_col: str, m: int = HLL_M) -> DataFrame:
    """(bucket, reg): the m max-rho registers.  One map-side-combined
    aggregation capped at m cells per task; buckets with no items are
    absent (reg 0 by convention).  ``m`` must be a power of two: the
    bucket is the low log2(m) bits and w the remaining bits, extracted
    with integer shifts (a float division would round away the low bits
    of a 60-bit hash)."""
    bbits = m.bit_length() - 1
    if 1 << bbits != m:
        raise ValueError("m must be a power of two")
    # canonical string form, matching streaming/sketches.windowed_hll:
    # hash64 is md5-based (string/binary input only), so a bare non-string
    # key column would fail analysis in batch and a binary key would hash
    # differently — the cast keeps batch and streaming registers
    # interchangeable across key types (no-op for string keys)
    h = hash64(F.col(key_col).cast("string"))
    w = F.shiftright(h, bbits)
    rho = F.when(w == 0, F.lit(HLL_RHO_CAP)).otherwise(_rho(w))
    return (
        items.select((h % F.lit(m)).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame, m: int = HLL_M) -> DataFrame:
    """(n_buckets_used, denom_scaled, est): the raw HLL estimate
    alpha*m^2/sum(2^-M_j), with empty buckets contributing 2^0 each.
    ``denom_scaled`` = 2^RHO_CAP * sum is exact int64; est is one IEEE
    division of inlined-constant numerator by it."""
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.coalesce(
            # python-api shiftleft takes only literal bit counts; the SQL
            # form accepts a column shift
            F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - reg)")),
            F.lit(0).cast("long"),
        ).alias("__used_sum"),
    )
    denom = F.col("__used_sum") + (F.lit(m) - F.col("n_buckets_used")) * F.lit(
        2**HLL_RHO_CAP
    ).cast("long")
    return agg.select(
        "n_buckets_used",
        denom.alias("denom_scaled"),
        F.round(F.lit(float(HLL_NUM)) / denom, 4).alias("est"),
    )


def histogram_quantile(
    cells: DataFrame, qs: list[float], lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(q, quantile_est): quantile estimates from fixed-bin histogram
    cells (the ``windowed_histogram`` layout: bin 0 = underflow,
    n_bins+1 = overflow).  Returns the LOWER EDGE of the first bin whose
    cumulative count reaches ceil(q*n) — deterministic, and within one
    bin width of the exact order statistic whenever the value lies in
    [lo, hi).  ONE pass: the cumulated cells (a window over the
    n_bins+2 sketch rows — metadata, never data) are cross-joined
    against an exploded literal array of the requested quantiles and the
    min qualifying bin per q is taken in a single aggregate, so the
    sketch aggregation runs once however many quantiles are asked."""
    from pyspark.sql import Window as W

    width = (hi - lo) / n_bins
    cum = F.sum("cnt").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0))
    tot = F.sum("cnt").over(W.partitionBy())
    cc = cells.select("bin", "cnt").groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    cc = cc.select("bin", "cnt", cum.alias("cum"), tot.alias("n"))
    qlit = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    need = F.ceil(F.col("q") * F.col("n"))
    picked = (
        cc.select("bin", "cum", "n", qlit)
        .where(F.col("cum") >= need)
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    edge = F.lit(float(lo)) + (F.col("bin") - 1) * F.lit(float(width))
    est = F.when(F.col("bin") == 0, F.lit(float(lo) - width)).otherwise(
        F.least(edge, F.lit(float(hi)))
    )
    return picked.select("q", est.alias("quantile_est"))


def hll_registers_grouped(
    items: DataFrame, group_cols: list[str], key_col: str, m: int = HLL_M
) -> DataFrame:
    """(group_cols..., bucket, reg): per-group HLL registers — the same
    max-rho cells as ``hll_registers`` keyed by group, so per-group
    state is bounded at m cells regardless of the group's cardinality
    (the per-source / per-language distinct profile a corpus data card
    reports)."""
    bbits = m.bit_length() - 1
    if 1 << bbits != m:
        raise ValueError("m must be a power of two")
    h = hash64(F.col(key_col).cast("string"))
    w = F.shiftright(h, bbits)
    rho = F.when(w == 0, F.lit(HLL_RHO_CAP)).otherwise(_rho(w))
    return (
        items.select(*group_cols, (h % F.lit(m)).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate_grouped(
    regs: DataFrame, group_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """(group_cols..., n_buckets_used, denom_scaled, est) per group, same
    integer-exact arithmetic as ``hll_estimate``."""
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - reg)")),
            F.lit(0).cast("long"),
        ).alias("__used_sum"),
    )
    denom = F.col("__used_sum") + (F.lit(m) - F.col("n_buckets_used")) * F.lit(
        2**HLL_RHO_CAP
    ).cast("long")
    return agg.select(
        *group_cols,
        "n_buckets_used",
        denom.alias("denom_scaled"),
        F.round(F.lit(float(HLL_NUM)) / denom, 4).alias("est"),
    )
