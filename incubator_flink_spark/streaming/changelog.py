"""Changelog (dynamic table) semantics — the reference's core streaming
abstraction (SURVEY.md §1.3): every intermediate stream can carry a
RowKind tag (+I insert, -U update-before, +U update-after, -D delete;
reference flink-core/.../types/RowKind.java:31-52), and operators either
produce or consume those tags.

Design-level policy in this engine (replacing the reference's
FlinkChangelogModeInferenceProgram): insert-only streams are plain
DataFrames; retracting streams carry an explicit ``__rowkind`` string
column.  The composition-time validator lives in streaming/modes.py
(declared consumed/produced RowKind sets per operator, edge-by-edge
inference, invalid wiring raises).  The operators here convert between
the two worlds:

- ``changelog_normalize``   upsert/CDC stream → current-state rows
  (StreamExecChangelogNormalize.java:61)
- ``drop_update_before``    filter '-U' (StreamExecDropUpdateBefore)
- ``retract_aggregate``     sum/count over a retracting stream by signed
  contribution (GroupAggFunction.java:43 retract path) — a pure
  expression, so it runs identically in batch and update-mode streaming
- ``snapshot_diff``         two table snapshots → changelog rows (the
  foreachBatch merge building block for upsert sinks)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

ROWKIND = "__rowkind"
INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE = "+I", "-U", "+U", "-D"
_ADDS = (INSERT, UPDATE_AFTER)
_RETRACTS = (UPDATE_BEFORE, DELETE)


def drop_update_before(df: DataFrame, op_col: str = ROWKIND) -> DataFrame:
    """Upsert consumers don't need '-U' rows (StreamExecDropUpdateBefore)."""
    return df.where(F.col(op_col) != UPDATE_BEFORE)


def changelog_normalize(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak: str, op_col: str = ROWKIND
) -> DataFrame:
    """Materialize the current state of a CDC/upsert stream: latest row
    per key by (ts, tiebreak); keys whose latest op is DELETE vanish.
    Batch form — one shuffle + partition-local rank. (The streaming form
    is keep_last_dedup over op != -U with delete tombstones.)"""
    w = W.partitionBy(*keys).orderBy(F.col(ts_col).desc(), F.col(tiebreak).desc())
    return (
        drop_update_before(df, op_col)
        .withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(op_col) != DELETE))
        .drop("__rn", op_col)
    )


def retract_aggregate(df: DataFrame, keys: list[str], value_col: str, op_col: str = ROWKIND) -> DataFrame:
    """Aggregate a retracting stream: adds (+I/+U) contribute +v/+1,
    retractions (-U/-D) contribute -v/-1 — the accumulator discipline of
    the reference's retractable agg functions (Sum/Count WithRetract).
    Keys whose live row count reaches 0 are dropped (empty-group
    retraction, GroupAggFunction.java:136-190 semantics)."""
    sign = F.when(F.col(op_col).isin(*_ADDS), F.lit(1)).when(
        F.col(op_col).isin(*_RETRACTS), F.lit(-1)
    )
    out = (
        df.groupBy(*keys)
        .agg(
            F.sum(sign * F.col(value_col)).alias("sum_value"),
            F.sum(sign).cast("bigint").alias("live_rows"),
        )
        .where(F.col("live_rows") > 0)
    )
    return out


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Diff two snapshots of a keyed table into changelog rows:
    +I for new keys, -D for vanished keys, -U/+U pairs for changed rows.
    Full-outer join on keys — the foreachBatch upsert-sink building block."""
    val_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"__old_{c}") for c in val_cols])
    n = new.select(*keys, *[F.col(c).alias(f"__new_{c}") for c in val_cols])
    j = o.join(n, keys, "full")
    old_present = F.col(f"__old_{val_cols[0]}").isNotNull()
    new_present = F.col(f"__new_{val_cols[0]}").isNotNull()
    changed = F.lit(False)
    for c in val_cols:
        changed = changed | (
            ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}"))
        )
    inserts = j.where(new_present & ~old_present).select(
        F.lit(INSERT).alias(ROWKIND), *keys, *[F.col(f"__new_{c}").alias(c) for c in val_cols]
    )
    deletes = j.where(old_present & ~new_present).select(
        F.lit(DELETE).alias(ROWKIND), *keys, *[F.col(f"__old_{c}").alias(c) for c in val_cols]
    )
    upd_before = j.where(old_present & new_present & changed).select(
        F.lit(UPDATE_BEFORE).alias(ROWKIND), *keys, *[F.col(f"__old_{c}").alias(c) for c in val_cols]
    )
    upd_after = j.where(old_present & new_present & changed).select(
        F.lit(UPDATE_AFTER).alias(ROWKIND), *keys, *[F.col(f"__new_{c}").alias(c) for c in val_cols]
    )
    return inserts.unionByName(deletes).unionByName(upd_before).unionByName(upd_after)


def retract_aggregate_stream(
    df: DataFrame, keys: list[str], value_col: str, op_col: str = ROWKIND
) -> DataFrame:
    """STREAMING retract aggregate that itself EMITS a retraction
    changelog (reference: GroupAggFunction.java:43 — on every change the
    operator sends UPDATE_BEFORE with the previous aggregate row, then
    UPDATE_AFTER/INSERT with the new one; when the live-row count drops
    to zero it sends DELETE and clears state).  This is the
    mid-pipeline form whose output a RetractableTopNFunction consumes —
    the composition FlinkChangelogModeInferenceProgram.scala:40 plans.

    State per key: (sum, live_rows) — O(1).  Input rows carry
    ``op_col`` (+I/+U add, -U/-D retract).  Output columns:
    (op_col, keys..., sum_value).

    Scale: one shuffle on the keys; per-batch contributions fold
    vectorized in pandas before the O(1) state update."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = T.StructType(
        [
            T.StructField(op_col, T.StringType()),
            *key_fields,
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("s", T.DoubleType()), T.StructField("n", T.LongType())]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        s, n = state.get if state.exists else (0.0, 0)
        had = state.exists and n > 0
        old_s = s
        for pdf in pdfs:
            if pdf.empty:
                continue
            sign = pdf[op_col].isin(_ADDS).astype(int) * 2 - 1
            s += float((sign * pdf[value_col].astype(float)).sum())
            n += int(sign.sum())
        out = []
        if n > 0:
            if not had:
                out.append({op_col: INSERT, "sum_value": s})
            elif s != old_s:
                out.append({op_col: UPDATE_BEFORE, "sum_value": old_s})
                out.append({op_col: UPDATE_AFTER, "sum_value": s})
            state.update((s, n))
        else:
            if had:
                out.append({op_col: DELETE, "sum_value": old_s})
            state.remove()
        if not out:
            return
        res = pd.DataFrame(out)
        for f, kv in zip(key_fields, key):
            res[f.name] = kv
        yield res[[c.name for c in out_schema.fields]]

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
