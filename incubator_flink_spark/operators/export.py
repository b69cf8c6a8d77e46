"""Training-shard export: deterministic global shuffle + sharded writes
(beyond-reference training-data scope, the output-management half of a
curation pipeline; the reference's closest analog is the filesystem sink's
partitioned layout, flink-table-runtime/.../filesystem/FileSystemTableFactory.java).

Why not ``orderBy(rand())``: training-data jobs must be reproducible and
restartable — the permutation has to be a pure function of (row identity,
seed), never of task scheduling. Both operators below key on the same
60-bit md5 hash the dedup family uses (functions/hashing.hash64), which
the DuckDB oracle replicates, so shard assignment itself is
driver-checkable.

Scale shape:
- ``deterministic_shuffle`` is ONE range-partitioned sort on an 8-byte
  key (Tungsten external sort, spillable) — the canonical way to produce
  a uniform global permutation of 100 TB without a driver bottleneck.
- ``export_shards`` shuffles once on the shard id (pmod of the hash) and
  writes each shard as its own directory partition; shard sizes are
  hash-uniform, so no shard becomes a straggler file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incubator_flink_spark.functions.hashing import hash64


def shuffle_key(id_col: str, seed: int):
    """The permutation key: hash64(seed || id). Pure in (id, seed)."""
    return hash64(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")))


def deterministic_shuffle(df: DataFrame, id_col: str, seed: int = 0) -> DataFrame:
    """Reproducible global permutation: rows ordered by a seeded hash of
    their id. Same (data, seed) → same order, independent of parallelism,
    task retries, or input split layout."""
    return df.orderBy(shuffle_key(id_col, seed), F.col(id_col))


def shard_id(id_col: str, num_shards: int, seed: int = 0):
    """Shard assignment: pmod(hash64(seed || id), num_shards) — uniform,
    deterministic, oracle-replicable."""
    return F.pmod(shuffle_key(id_col, seed), F.lit(num_shards)).cast("int")


def export_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str,
    seed: int = 0,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``num_shards`` hash-sharded, internally shuffled
    directory partitions under ``path`` (shard=K/part-*.{fmt}).

    One shuffle: repartition on the shard id co-locates each shard, and
    the within-shard sort by the same seeded hash yields the
    deterministic training order. maxRecordsPerFile is left to the
    writer config; at 100 TB set spark.sql.files.maxRecordsPerFile to
    bound file sizes."""
    sid = shard_id(id_col, num_shards, seed)
    (
        df.withColumn("shard", sid)
        .repartition(num_shards, F.col("shard"))
        .sortWithinPartitions(F.col("shard"), shuffle_key(id_col, seed), F.col(id_col))
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def assign_split(
    df: DataFrame,
    id_col: str,
    train: int = 90,
    val: int = 95,
    den: int = 100,
    salt: str = "split:",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket =
    hash64(salt || id) mod den; [0, train) -> 'train', [train, val) ->
    'val', [val, den) -> 'test', appended as a ``split`` column.

    Map-only (zero shuffles) and growth-stable: a row's split depends
    only on its own id, so adding or removing documents never reshuffles
    anyone else — the property that keeps eval sets uncontaminated
    across corpus refreshes.  Stratification is free: within any slice
    (language, source, ...) the hash buckets are uniform.  At 100 TB
    this is a pure narrow transformation fused into whatever scan or
    write surrounds it."""
    b = hash64(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % den
    return df.withColumn(
        "split",
        F.when(b < train, "train").when(b < val, "val").otherwise("test"),
    )


def zorder_key(x, y, bits: int):
    """Morton/Z-order interleave of two non-negative int columns (bit i
    of x -> bit 2i, bit i of y -> bit 2i+1).  Pure integer Catalyst —
    the shift counts are python literals, so this compiles to a flat
    codegen expression — and replicated exactly in SQL (zorder_key_sql).

    This is the multi-dimensional clustering key behind OPTIMIZE
    ZORDER-style layouts (public: Morton 1966; Delta/Iceberg docs):
    range-partitioning 100 TB by the z-key gives every output shard a
    narrow range in BOTH dimensions, so scans filtered on either column
    prune most shards via min/max statistics."""
    from pyspark.sql import functions as FF

    terms = []
    # & 1 (not % 2): for a negative input % 2 yields -1 and the shifted
    # term corrupts the key (DuckDB's twin would hard-error); the bitwise
    # mask gives the defined two's-complement bit on both engines
    for i in range(bits):
        terms.append(FF.shiftleft(FF.shiftright(x, i).bitwiseAND(FF.lit(1)), 2 * i))
        terms.append(FF.shiftleft(FF.shiftright(y, i).bitwiseAND(FF.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t  # disjoint bits: addition == bitwise OR
    return out


def zorder_key_sql(xexpr: str, yexpr: str, bits: int) -> str:
    """DuckDB twin of zorder_key."""
    terms = []
    # each term fully parenthesized: in DuckDB (as in Postgres) `+` binds
    # TIGHTER than `<<`, so `a << 0 + b << 1` would parse as a << (0+b) << 1
    for i in range(bits):
        terms.append(f"(((({xexpr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({yexpr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def compaction_plan(
    files: DataFrame,
    partition_cols: list[str],
    order_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction planner (the lakehouse OPTIMIZE/rewrite
    step): within each table partition, files are walked in a
    deterministic order and greedily packed into output bins of
    ~target_bytes by cumulative size — bin = floor(bytes_before /
    target), so a bin closes as soon as it reaches the target (one file
    may straddle, the standard greedy bound: every bin except the last
    is >= target - max_file_size full).

    The per-partition cumulative sum is a window over the FILE LIST —
    metadata-sized (one row per file), not data-sized, which is why a
    plain keyed window is the right plan here even at 100 TB: a million
    files is still a tiny frame.  The actual data movement this plan
    drives is one partition-local rewrite per bin.  Returns the file
    rows with their assigned ``bin``."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    cum_before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return files.withColumn(
        "bin", F.floor(cum_before / F.lit(target_bytes)).cast("bigint")
    )
