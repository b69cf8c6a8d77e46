"""Streaming sketches: per-window count-min cells maintained
incrementally by Structured Streaming's stateful aggregation.

Sketches are MERGEABLE by construction — cell-wise sums — which is
exactly Spark's partial-aggregation contract, so the streaming form is
just a windowed groupBy over (window, row, bucket): micro-batches fold
into the same cells a batch build would produce, and update mode emits
the revised cells as late data arrives.  State per window is bounded at
depth*width cells regardless of key cardinality — the reason a
100 TB/day stream can afford per-window frequency summaries at all.

Estimates use the same ``cms_estimate`` as batch (min over depth probes
against the final cells).  Reference has no sketch operators
(beyond-reference scope); the streaming-state discipline mirrors
flink-streaming-java's windowed aggregate state
(WindowOperator.java's per-window accumulators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_flink_spark.functions.hashing import hash64
from incubator_flink_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH, cms_bucket


def _cms_cells(key: Column, depth: int, width: int) -> Column:
    h = hash64(key)
    return F.array(
        *[
            F.struct(F.lit(r).alias("row"), cms_bucket(h, r, width).alias("bucket"))
            for r in range(depth)
        ]
    )


def windowed_cms(
    stream: DataFrame,
    ts_col: str,
    window_s: int,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    watermark_s: int | None = None,
) -> DataFrame:
    """(window_start, window_end, row, bucket, cell): per-tumbling-window
    count-min cells, maintained incrementally.  Works identically on a
    batch DataFrame (the test equivalence) because the plan is pure
    windowed aggregation."""
    src = stream
    if watermark_s is not None and stream.isStreaming:
        src = stream.withWatermark(ts_col, f"{watermark_s} seconds")
    return (
        src.select(
            F.window(F.col(ts_col), f"{window_s} seconds").alias("w"),
            F.explode(_cms_cells(F.col(key_col), depth, width)).alias("rb"),
        )
        .groupBy(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("rb.row").alias("row"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cell"))
    )


def windowed_hll(
    stream: DataFrame,
    ts_col: str,
    window_s: int,
    key_col: str,
    m: int = 256,
    watermark_s: int | None = None,
) -> DataFrame:
    """(window_start, window_end, bucket, reg): per-tumbling-window
    HyperLogLog registers, maintained incrementally — MAX is as
    mergeable as SUM, so micro-batches fold into exactly the batch
    registers and per-window state is bounded at m cells at any key
    cardinality.  Feed the final cells of a window to
    ``operators.sketch.hll_estimate`` for the distinct-count estimate."""
    from incubator_flink_spark.operators.sketch import HLL_RHO_CAP, _rho

    bbits = m.bit_length() - 1
    if 1 << bbits != m:
        raise ValueError("m must be a power of two")
    src = stream
    if watermark_s is not None and stream.isStreaming:
        src = stream.withWatermark(ts_col, f"{watermark_s} seconds")
    # hash64 is md5-based (string input); canonical string form keys any type
    h = hash64(F.col(key_col).cast("string"))
    w = F.shiftright(h, bbits)
    rho = F.when(w == 0, F.lit(HLL_RHO_CAP)).otherwise(_rho(w))
    return (
        src.select(
            F.window(F.col(ts_col), f"{window_s} seconds").alias("w"),
            (h % F.lit(m)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
        )
        .agg(F.max("rho").alias("reg"))
    )


def windowed_histogram(
    stream: DataFrame,
    ts_col: str,
    window_s: int,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    watermark_s: int | None = None,
) -> DataFrame:
    """(window_start, window_end, bin, cnt): per-tumbling-window
    fixed-bin counting histogram over a bounded value domain [lo, hi) —
    the mergeable quantile sketch (bin-wise sums ARE partial
    aggregation, so micro-batches fold into exactly the batch cells and
    per-window state is bounded at n_bins+2 cells at any cardinality).
    Bin 0 / n_bins+1 catch under/overflow so nothing is dropped; feed a
    window's cells to ``operators.sketch.histogram_quantile`` for
    quantiles with error bounded by one bin width."""
    if not hi > lo:
        raise ValueError("need hi > lo")
    src = stream
    if watermark_s is not None and stream.isStreaming:
        src = stream.withWatermark(ts_col, f"{watermark_s} seconds")
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(n_bins))
    b = (
        F.when(v < lo, F.lit(-1)).when(v >= hi, F.lit(n_bins)).otherwise(raw) + 1
    ).cast("int")
    return (
        src.select(
            F.window(F.col(ts_col), f"{window_s} seconds").alias("w"), b.alias("bin")
        )
        .groupBy(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bin",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
