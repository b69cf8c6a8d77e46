"""Retract-emitting streaming inner join (reference:
StreamingJoinOperator.java:61 — the unbounded two-sided join whose
Javadoc at lines 136-190 gives the retract pseudo-code: each side stores
its rows per key; an insert emits +I for every current match on the other
side; a delete emits -D for every match).

Spark placement: the two-input operator becomes a tagged union (side =
'left'/'right') into one applyInPandasWithState keyed on the join key —
the same union-dispatch trick as the temporal join. Input rows carry a
``__rowkind`` (+I / -D; -U/+U arrive as -D then +I from
``snapshot_diff``-style producers). Output rows are tagged the same way,
so the join composes with ``retract_aggregate`` downstream — the
mid-pipeline retract consumption the reference's changelog inference
plans automatically.

State per key: both sides' live rows — O(rows per key), identical to the
reference's JoinRecordStateViews (no condition-level optimization here;
at 100TB pair with key-level TTL).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from incubator_flink_spark.streaming.changelog import DELETE, INSERT, ROWKIND


def retracting_join_stream(
    tagged: DataFrame,
    keys: list[str],
    side_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Inner-join two retracting streams on ``keys``.

    Input: union of both sides with columns [keys..., side_col
    ('left'/'right'), __rowkind (+I/-D), id_col, value_col].
    Output: (+I/-D, keys..., left_id, left_value, right_id, right_value).
    """
    key_fields = [f for f in tagged.schema.fields if f.name in keys]
    out_schema = T.StructType(
        [
            T.StructField(ROWKIND, T.StringType()),
            *key_fields,
            T.StructField("left_id", T.LongType()),
            T.StructField("left_value", T.DoubleType()),
            T.StructField("right_id", T.LongType()),
            T.StructField("right_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("l_id", T.ArrayType(T.LongType())),
            T.StructField("l_val", T.ArrayType(T.DoubleType())),
            T.StructField("r_id", T.ArrayType(T.LongType())),
            T.StructField("r_val", T.ArrayType(T.DoubleType())),
        ]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            l_id, l_val, r_id, r_val = (list(x) for x in state.get)
        else:
            l_id, l_val, r_id, r_val = [], [], [], []
        out: list[dict[str, Any]] = []

        def emit(kind, lid, lval, rid, rval):
            out.append(
                {ROWKIND: kind, "left_id": lid, "left_value": lval, "right_id": rid, "right_value": rval}
            )

        for pdf in pdfs:
            for _, row in pdf.iterrows():
                rid_, val, kind, side = int(row[id_col]), float(row[value_col]), row[ROWKIND], row[side_col]
                mine_id, mine_val = (l_id, l_val) if side == "left" else (r_id, r_val)
                other_id, other_val = (r_id, r_val) if side == "left" else (l_id, l_val)
                if kind == INSERT:
                    mine_id.append(rid_)
                    mine_val.append(val)
                    for oid, oval in zip(other_id, other_val):
                        if side == "left":
                            emit(INSERT, rid_, val, oid, oval)
                        else:
                            emit(INSERT, oid, oval, rid_, val)
                elif kind == DELETE:
                    try:
                        pos = mine_id.index(rid_)
                    except ValueError:
                        continue  # delete for unknown row: ignore (late retract)
                    mine_id.pop(pos)
                    mine_val.pop(pos)
                    for oid, oval in zip(other_id, other_val):
                        if side == "left":
                            emit(DELETE, rid_, val, oid, oval)
                        else:
                            emit(DELETE, oid, oval, rid_, val)
        state.update((l_id, l_val, r_id, r_val))
        if out:
            res = pd.DataFrame(out)
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    return tagged.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
