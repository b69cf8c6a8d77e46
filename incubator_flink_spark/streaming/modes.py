"""Changelog-mode inference and composition validation — the design-level
policy SURVEY §4.1 promises, mirroring the reference's planner pass
(flink-table-planner/.../FlinkChangelogModeInferenceProgram.scala:40 and
flink-table-common ChangelogMode.java): every streaming operator declares
the RowKind set it CONSUMES and the set it PRODUCES, and a composition is
validated edge-by-edge BEFORE any query is wired — an append-only
consumer fed a retracting stream fails at composition time with the
offending edge named, instead of silently folding -D rows as inserts.

Modes are plain frozensets of RowKind tags, so "can consume" is subset
containment — exactly ChangelogModeInference's satisfiability check.

Scale note: this is a pure composition-time check (no runtime cost); the
runtime operators stay the applyInPandasWithState / Catalyst plans they
already are.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from incubator_flink_spark.streaming.changelog import DELETE, INSERT, UPDATE_AFTER, UPDATE_BEFORE

# the reference's named modes (ChangelogMode.insertOnly/upsert/all)
INSERT_ONLY = frozenset({INSERT})
INSERT_DELETE = frozenset({INSERT, DELETE})  # retract stream without updates
UPSERT = frozenset({INSERT, UPDATE_AFTER, DELETE})
ALL_KINDS = frozenset({INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE})


class ChangelogModeError(ValueError):
    """Invalid operator wiring (the inference program's 'query requires a
    changelog mode the child cannot provide' failure)."""


@dataclass(frozen=True)
class ChangelogOp:
    """One streaming operator with declared changelog contract.

    ``consumes``: row kinds the operator understands on input — the edge
    is valid iff the upstream mode is a SUBSET of this.
    ``produces``: the output mode, either fixed or a function of the
    input mode (e.g. drop_update_before = input minus '-U').
    ``transform``: the actual DataFrame wiring, applied only after the
    whole composition validates.
    """

    name: str
    consumes: frozenset
    produces: frozenset | Callable[[frozenset], frozenset]
    transform: Callable[[DataFrame], DataFrame]

    def output_mode(self, input_mode: frozenset) -> frozenset:
        return self.produces(input_mode) if callable(self.produces) else self.produces


def infer_modes(source_mode: frozenset, ops: list[ChangelogOp]) -> list[frozenset]:
    """Validate the chain and return the mode on every edge
    ([source, after op1, after op2, ...]); raises ChangelogModeError on
    the first invalid edge, naming the operator and the rejected kinds."""
    modes = [frozenset(source_mode)]
    for op in ops:
        cur = modes[-1]
        if not cur <= op.consumes:
            rejected = sorted(cur - op.consumes)
            raise ChangelogModeError(
                f"operator '{op.name}' consumes only {sorted(op.consumes)} but its "
                f"upstream produces {sorted(cur)} — rejected kinds {rejected}. "
                "Insert a mode-converting stage (e.g. drop_update_before for upsert "
                "consumers, changelog_normalize for append consumers) or use the "
                "retraction-consuming variant of the operator."
            )
        modes.append(op.output_mode(cur))
    return modes


def compose(df: DataFrame, source_mode: frozenset, ops: list[ChangelogOp]) -> tuple[DataFrame, frozenset]:
    """Validate then wire: returns (output DataFrame, output mode).
    Validation happens for the WHOLE chain before any transform runs, so
    an invalid composition never partially materializes."""
    modes = infer_modes(source_mode, ops)
    out = df
    for op in ops:
        out = op.transform(out)
    return out, modes[-1]


# --------------------------------------------------------------- op specs --
# Declared contracts for the engine's retracting operators.  consumes is
# what the implementation actually folds correctly; produces matches the
# kinds each implementation emits (see the cited functions).


def retracting_join_op(keys: list[str], side_col: str, id_col: str, value_col: str) -> ChangelogOp:
    """retract_join.retracting_join_stream: folds +I/-D only (updates
    must be split upstream), emits +I/-D pair rows."""
    from incubator_flink_spark.streaming.retract_join import retracting_join_stream

    return ChangelogOp(
        name="retracting_join",
        consumes=INSERT_DELETE,
        produces=INSERT_DELETE,
        transform=lambda df: retracting_join_stream(df, keys, side_col, id_col, value_col),
    )


def retract_aggregate_op(keys: list[str], value_col: str, op_col: str = "__rowkind") -> ChangelogOp:
    """changelog.retract_aggregate_stream: consumes any retracting input
    (+I/+U add, -U/-D retract), emits the full retraction protocol
    (+I first value, -U/+U on change, -D on empty group) —
    GroupAggFunction.java:43."""
    from incubator_flink_spark.streaming.changelog import retract_aggregate_stream

    return ChangelogOp(
        name="retract_aggregate",
        consumes=ALL_KINDS,
        produces=ALL_KINDS,
        transform=lambda df: retract_aggregate_stream(df, keys, value_col, op_col=op_col),
    )


def streaming_topn_op(
    keys: list[str], id_col: str, value_col: str, n: int, op_col: str | None = None
) -> ChangelogOp:
    """stateful.streaming_topn: WITHOUT op_col it is an append-only
    consumer (RowKind-blind — feeding it a retracting stream would fold
    -D rows as inserts, the exact bug this validator rejects); WITH
    op_col it consumes the full retraction protocol
    (RetractableTopNFunction.java).  Emits +I/-D ranking deltas."""
    from incubator_flink_spark.streaming.stateful import streaming_topn

    return ChangelogOp(
        name="streaming_topn" if op_col else "streaming_topn(append-only)",
        consumes=ALL_KINDS if op_col else INSERT_ONLY,
        produces=INSERT_DELETE,
        transform=lambda df: streaming_topn(df, keys, id_col, value_col, n, op_col=op_col),
    )


def drop_update_before_op(op_col: str = "__rowkind") -> ChangelogOp:
    """changelog.drop_update_before: retract → upsert mode conversion
    (StreamExecDropUpdateBefore) — output mode is the input minus '-U'."""
    from incubator_flink_spark.streaming.changelog import drop_update_before

    return ChangelogOp(
        name="drop_update_before",
        consumes=ALL_KINDS,
        produces=lambda mode: mode - {UPDATE_BEFORE},
        transform=lambda df: drop_update_before(df, op_col),
    )


def map_op(name: str, fn: Callable[[DataFrame], DataFrame]) -> ChangelogOp:
    """A per-row projection/filter that preserves the changelog mode
    (Calc nodes in the inference program pass modes through)."""
    return ChangelogOp(name=name, consumes=ALL_KINDS, produces=lambda mode: mode, transform=fn)
