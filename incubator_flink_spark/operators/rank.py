"""Distributed global rank / exact NTILE without a single-partition window.

A keyless ``Window.orderBy(...)`` funnels every row through ONE window
partition — correct, but a scale-killer on fact-proportional inputs
(Spark itself warns "Moving all data to a single partition").  This
module computes the same global row numbers with the classic
range-partition + offset-cumsum construction (the technique behind every
distributed sort-rank, e.g. TeraSort ranking; reference parity:
flink-runtime's range-partition + local-sort batch sort, which Flink's
batch rank also builds on):

1. ``repartitionByRange`` on the total order (so partition p holds keys
   strictly below partition p+1) + ``sortWithinPartitions``;
2. one tiny job counts rows per partition (P rows reach the driver);
3. the global rank of a row is its partition's cumulative offset plus
   its local row number — assigned map-side in the JVM from
   ``monotonically_increasing_id()``'s (partition << 33) + row-index
   layout, with the P-entry offset table riding as one array literal
   (an earlier Arrow ``mapInPandas`` pass computed the same thing but
   paid a Python-worker round trip per task — pure boundary latency).

No shuffle beyond the range exchange itself, no Python anywhere, and
parallelism stays P across every step.

``ntile_exact`` reproduces SQL NTILE's bucket arithmetic bit-for-bit
(first ``n mod B`` buckets get one extra row) so DuckDB-oracle queries
can swap a global NTILE for the distributed form without changing one
output row.

The intermediate is pinned with ``localCheckpoint`` so the count job and
the final pass share one materialization (the O(1)-lineage discipline of
operators/graph.py); at 100 TB the same pin would be a DISK_ONLY persist.

Callers MUST supply a total order (include a unique tiebreak column) —
ties that straddle a range boundary would otherwise rank
nondeterministically, exactly as they would under a global NTILE.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PID = "__rank_pid"

# Above this partition count the per-partition offset table is shipped as
# a broadcast join instead of an inline array literal: the literal is free
# at harness scale but becomes a megabyte-scale expression tree at a
# 100 TB-realistic 10^4-10^5 partitions (VERDICT r10 #9).
_OFFSETS_INLINE_MAX = 256


def _cols(order_cols: Iterable[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def distributed_rank(
    df: DataFrame,
    order_cols: Iterable[Column | str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + a 1-based global row number over ``order_cols`` (which
    must be a total order), computed at full parallelism."""
    spark = df.sparkSession
    cols = _cols(order_cols)
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.repartitionByRange(p, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r[_PID]: r["n"]
        for r in d.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # Rank assignment stays in the JVM: the local row index of the
    # checkpointed, sorted partition is monotonically_increasing_id()
    # minus its partition base (pid << 33 — the documented MID layout),
    # and the partition's global offset rides in as one array literal.
    # The previous Arrow mapInPandas pass computed the same thing but
    # paid a Python-worker round trip PER TASK (profiled: ~0.25s x 32
    # tasks x 2 stages per ntile call, with ~0 CPU — pure boundary
    # latency; guide §4.1 "eliminate the JVM<->Python boundary").
    # Determinism: the checkpoint pins partition contents and order, so
    # MID's (partition, row-index) decomposition is stable across
    # re-evaluations — same ranks as the pandas form, bit for bit.
    n_parts = max(offsets) + 1 if offsets else 0
    if n_parts == 0:
        return d.withColumn(rank_col, F.lit(None).cast("long")).drop(_PID)
    local_idx = (
        "(monotonically_increasing_id() - shiftleft(CAST(spark_partition_id() AS BIGINT), 33))"
    )
    if n_parts <= _OFFSETS_INLINE_MAX:
        off_arr = "array(" + ",".join(str(offsets.get(i, 0)) + "L" for i in range(n_parts)) + ")"
        rank = F.expr(
            f"CAST(element_at({off_arr}, spark_partition_id() + 1) + {local_idx} + 1 AS BIGINT)"
        )
        return d.withColumn(rank_col, rank).drop(_PID)
    # Scale path: at 10^4-10^5 partitions the inline array would be a
    # megabyte-scale expression tree re-analyzed per query (guide §7.3
    # plan-size note).  Ship the offsets out-of-plan instead: a broadcast
    # hash join on the partition id.  The streamed side is the pinned
    # checkpoint, and a broadcast join preserves its partitioning and
    # within-partition row order, so the MID decomposition (and hence
    # every rank) is bit-identical to the inline form.
    off_df = spark.createDataFrame(
        [(int(i), int(offsets.get(i, 0))) for i in range(n_parts)],
        f"{_PID} INT, __rank_off LONG",
    )
    return (
        d.join(F.broadcast(off_df), _PID)
        .withColumn(rank_col, F.expr(f"CAST(__rank_off + {local_idx} + 1 AS BIGINT)"))
        .drop(_PID, "__rank_off")
    )


def ntile_exact(
    df: DataFrame,
    order_cols: Iterable[Column | str],
    n_buckets: int,
    bucket_col: str = "bucket",
    partition_cols: Iterable[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n_buckets) OVER ([PARTITION BY partition_cols]
    ORDER BY order_cols)`` at full parallelism.

    Ranks once over (partition_cols, order_cols) — groups are contiguous
    in the range order — then rebases each group's local rank with a
    broadcast join of the group-sized (min-rank, count) table and applies
    NTILE's exact size split: with n rows, the first ``n % B`` buckets
    hold ``n // B + 1`` rows, the rest ``n // B``."""
    pcols = list(partition_cols)
    ranked = distributed_rank(
        df, [*pcols, *_cols(order_cols)], rank_col="__rank", num_partitions=num_partitions
    )
    if pcols:
        groups = ranked.groupBy(*pcols).agg(
            F.min("__rank").alias("__gstart"), F.count(F.lit(1)).alias("__gn")
        )
        ranked = ranked.join(F.broadcast(groups), pcols)
        local = F.col("__rank") - F.col("__gstart") + 1
        n = F.col("__gn")
    else:
        groups = ranked.agg(
            F.min("__rank").alias("__gstart"), F.count(F.lit(1)).alias("__gn")
        )
        ranked = ranked.crossJoin(F.broadcast(groups))
        local = F.col("__rank") - F.col("__gstart") + 1
        n = F.col("__gn")
    b = F.lit(n_buckets)
    q = F.floor(n / b)  # base bucket size
    rem = n % b  # buckets that get one extra row
    head = rem * (q + 1)  # rows living in the oversized buckets
    # ceil(a/d) = floor((a-1)/d) + 1 for a,d >= 1; the else-branch divisor
    # is guarded against the (unreachable when n < B) q = 0 case
    bucket = F.when(local <= head, F.floor((local - 1) / (q + 1)) + 1).otherwise(
        rem + F.floor((local - head - 1) / F.greatest(q, F.lit(1))) + 1
    )
    return ranked.withColumn(bucket_col, bucket.cast("bigint")).drop(
        "__rank", "__gstart", "__gn"
    )
