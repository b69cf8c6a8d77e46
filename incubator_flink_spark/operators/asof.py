"""As-of (temporal/versioned-table) join.

Reference: the event-time temporal join operator
flink-table-runtime/.../operators/join/temporal/TemporalRowTimeJoinOperator.java:78
(probe rows join the build-side version valid at the probe row's event
time, i.e. the latest build row with build_ts <= probe_ts per key).

Spark-first design: instead of a per-key stateful loop, tag both sides,
union them, and run one ``last(..., ignorenulls=True)`` window ordered by
(ts, side) per key — a single shuffle on the join key plus a
partition-local sort, which is exactly the sort-merge as-of pattern and
scales linearly (no broadcast, no skew beyond the key distribution, no
driver collect). Build rows sort before probe rows at equal timestamps,
matching the reference's inclusive `<=` version semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    probe_ts: str,
    build_ts: str,
    payload: dict[str, str],
    tiebreak: str | None = None,
    how: str = "left",
) -> DataFrame:
    """As-of join: probe columns + the requested build payload columns
    (renamed per ``payload``: build_col -> out_col) from the latest build
    row with build_ts <= probe_ts on equal ``keys``.

    ``tiebreak``: optional build column ordering build rows with identical
    (keys, ts) — the highest wins, making the result deterministic.

    ``how``: "left" keeps probe rows with no valid version (null payload);
    "inner" drops them (the reference's temporal table FUNCTION join is
    inner — LATERAL TABLE(rates(o_time)) emits nothing for unmatched rows,
    TemporalRowTimeJoinOperator.java:78 vs the LEFT temporal join variant).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    out_types = {c.name: c.dataType for c in build.schema.fields}
    b = build.select(
        *keys,
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(1).alias("__p___matched"),
        *(F.col(src).alias(f"__p_{dst}") for src, dst in payload.items()),
        *((F.col(tiebreak).alias("__tb"),) if tiebreak else ()),
    )
    p = probe.withColumn("__ts", F.col(probe_ts)).withColumn("__side", F.lit(1))
    if tiebreak:
        p = p.withColumn("__tb", F.lit(None).cast(out_types[tiebreak]))
    unioned = p.unionByName(b, allowMissingColumns=True)
    order = [F.col("__ts"), F.col("__side")] + ([F.col("__tb")] if tiebreak else [])
    w = W.partitionBy(*keys).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    for dst in [*payload.values(), "__matched"]:
        unioned = unioned.withColumn(dst, F.last(f"__p_{dst}", ignorenulls=True).over(w))
    out = unioned.where(F.col("__side") == 1)
    if how == "inner":
        out = out.where(F.col("__matched").isNotNull())
    drop = (
        ["__ts", "__side", "__matched", "__p___matched"]
        + [f"__p_{d}" for d in payload.values()]
        + (["__tb"] if tiebreak else [])
    )
    return out.drop(*drop)
