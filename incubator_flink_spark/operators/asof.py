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

    The payload columns are packed into ONE struct before the window so a
    single ``last(ignorenulls=True)`` picks one WHOLE build row — a
    legitimately-NULL payload value stays NULL instead of being skipped
    for an older row's value (no column tearing).  Build rows with NULL
    ``build_ts`` are dropped (they can never be the valid version).
    Without ``tiebreak``, which of several equal-(keys, ts) build rows is
    picked is nondeterministic (one whole row, but not a defined one);
    supply ``tiebreak`` for a deterministic result.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    b = build.where(F.col(build_ts).isNotNull()).select(
        *keys,
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            *(F.col(src).alias(dst) for src, dst in payload.items())
        ).alias("__p"),
        *((F.col(tiebreak).alias("__tb"),) if tiebreak else ()),
    )
    p = probe.withColumn("__ts", F.col(probe_ts)).withColumn("__side", F.lit(1))
    unioned = p.unionByName(b, allowMissingColumns=True)
    order = [F.col("__ts"), F.col("__side")] + ([F.col("__tb")] if tiebreak else [])
    w = W.partitionBy(*keys).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    unioned = unioned.withColumn("__pick", F.last("__p", ignorenulls=True).over(w))
    out = unioned.where(F.col("__side") == 1)
    if how == "inner":
        out = out.where(F.col("__pick").isNotNull())
    for dst in payload.values():
        out = out.withColumn(dst, F.col("__pick").getField(dst))
    drop = ["__ts", "__side", "__p", "__pick"] + (["__tb"] if tiebreak else [])
    return out.drop(*drop)


def asof_join_nearest(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    probe_ts: str,
    build_ts: str,
    payload: dict[str, str],
    direction: str = "nearest",
    tolerance_s: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Directional as-of join with tolerance (the pandas ``merge_asof``
    surface: direction backward / forward / nearest, optional match
    window) — the generalization of the reference's backward-only
    temporal join semantics.

    Same scale shape as ``asof_join``: tag-union both sides and run ONE
    keyed window per direction (last-non-null preceding for backward,
    first-non-null following for forward) — a single join-key shuffle,
    no broadcast, no driver collect.  ``nearest`` evaluates both
    directions in the same two window passes over the same shuffle and
    picks the smaller |probe_ts - build_ts|, ties to the backward match
    (pandas' tie rule).  Matches beyond ``tolerance_s`` seconds are
    nulled out (probe rows are kept — left semantics).

    At equal timestamps the build row matches in BOTH directions
    (inclusive <=/>= bounds, the reference's inclusive version rule), so
    a zero-delta match always wins under ``nearest``.

    Build-row payload + build_ts are packed into ONE struct so each
    direction's single ``last``/``first(ignorenulls=True)`` picks one
    WHOLE build row — a legitimately-NULL payload value stays NULL (no
    column tearing across different build rows).  Build rows with NULL
    ``build_ts`` are dropped (no position on the time axis).  Without
    ``tiebreak``, the pick among equal-(keys, ts) build rows is one
    whole row but WHICH row is nondeterministic; supply ``tiebreak``
    (smallest wins) for a deterministic result.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction: {direction!r}")
    out_cols = list(payload.values())
    if "__bts" in out_cols:
        raise ValueError("payload output name '__bts' is reserved")
    b = build.where(F.col(build_ts).isNotNull()).select(
        *keys,
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(build_ts).alias("__bts"),
            *(F.col(src).alias(dst) for src, dst in payload.items()),
        ).alias("__p"),
        *((F.col(tiebreak).alias("__tb"),) if tiebreak else ()),
    )
    p = probe.withColumn("__ts", F.col(probe_ts)).withColumn("__side", F.lit(1))
    u = p.unionByName(b, allowMissingColumns=True)

    # Deterministic pick among equal-(key, ts) build rows: the SMALLEST
    # tiebreak wins in either direction (matching an oracle's
    # ROW_NUMBER ... ORDER BY delta, build_ts, tiebreak rule) — so the
    # backward window (last-preceding) orders the tiebreak DESC and the
    # forward window (first-following) ASC.
    if direction in ("backward", "nearest"):
        # build rows sort before probe rows at equal ts -> inclusive <=
        order_b = [F.col("__ts"), F.col("__side")] + (
            [F.col("__tb").desc_nulls_last()] if tiebreak else []
        )
        wb = (
            W.partitionBy(*keys)
            .orderBy(*order_b)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        u = u.withColumn("__b", F.last("__p", ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        # probe rows sort before build rows at equal ts -> inclusive >=
        order_f = [F.col("__ts"), -F.col("__side")] + (
            [F.col("__tb").asc_nulls_first()] if tiebreak else []
        )
        wf = (
            W.partitionBy(*keys)
            .orderBy(*order_f)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        u = u.withColumn("__f", F.first("__p", ignorenulls=True).over(wf))

    out = u.where(F.col("__side") == 1)
    tol = F.lit(tolerance_s) if tolerance_s is not None else None

    def _ok(delta):
        cond = delta.isNotNull()
        if tol is not None:
            cond = cond & (delta <= tol)
        return cond

    if direction == "backward":
        ok = _ok(F.col("__ts").cast("long") - F.col("__b").getField("__bts").cast("long"))
        sel = {c: F.when(ok, F.col("__b").getField(c)) for c in out_cols}
    elif direction == "forward":
        ok = _ok(F.col("__f").getField("__bts").cast("long") - F.col("__ts").cast("long"))
        sel = {c: F.when(ok, F.col("__f").getField(c)) for c in out_cols}
    else:
        db = F.col("__ts").cast("long") - F.col("__b").getField("__bts").cast("long")
        df_ = F.col("__f").getField("__bts").cast("long") - F.col("__ts").cast("long")
        okb, okf = _ok(db), _ok(df_)
        use_b = okb & (~okf | (db <= df_))  # tie -> backward
        sel = {
            c: F.when(use_b, F.col("__b").getField(c)).when(
                okf, F.col("__f").getField(c)
            )
            for c in out_cols
        }
    for c, expr in sel.items():
        out = out.withColumn(c, expr)
    keep = [c for c in probe.columns] + out_cols
    return out.select(*keep)
