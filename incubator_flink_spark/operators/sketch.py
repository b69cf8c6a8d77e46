"""Count-min sketch for streaming/heavy-hitter frequency estimation
(public algorithm: Cormode & Muthukrishnan 2005).  The reference has no
sketch operators (beyond-reference scope); this gives the engine a
fixed-memory frequency summary whose size is independent of corpus
cardinality.

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

from incubator_flink_spark.functions.hashing import P, hash64, hash64_sql

CMS_DEPTH = 4
CMS_WIDTH = 512

_rng = random.Random(271828)
CMS_AB = [(_rng.randrange(1, P), _rng.randrange(0, P)) for _ in range(CMS_DEPTH)]


def cms_bucket(h: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Bucket of base-hash ``h`` in sketch row ``row``: universal hash
    mod width (integer-only, int64-safe: a < P, h%P < P => product < 2^60)."""
    a, b = CMS_AB[row]
    return ((F.lit(a) * (h % F.lit(P)) + F.lit(b)) % F.lit(P)) % F.lit(width)


def cms_bucket_sql(hexpr: str, row: int, width: int = CMS_WIDTH) -> str:
    a, b = CMS_AB[row]
    return f"((({a} * (({hexpr}) % {P}) + {b}) % {P}) % {width})"


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
