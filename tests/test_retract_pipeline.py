"""End-to-end multi-stage retraction pipeline (VERDICT r5 item 6):

    retracting_join_stream  →  retract_aggregate_stream  →  streaming_topn

composed as three chained streaming stages (each stage's micro-batch
output is relayed as the next stage's file-source input, preserving
batch boundaries — the changelog-ordered channel between operators that
the reference's planner wires up via
FlinkChangelogModeInferenceProgram.scala:40), driven by RANDOMIZED
interleavings of inserts and deletes on both join sides.  The final
TopN folded from stage-3 deltas must equal the batch recompute over the
final table snapshots.

Values are small integers (as doubles) so every sum is exact and the
-U retraction rows match their prior +U insertions bit-for-bit.
"""

from __future__ import annotations

import os
import random
import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from incubator_flink_spark.streaming.changelog import (
    DELETE,
    INSERT,
    ROWKIND,
    retract_aggregate,
    retract_aggregate_stream,
)
from incubator_flink_spark.streaming.modes import (
    ALL_KINDS,
    INSERT_DELETE,
    ChangelogModeError,
    infer_modes,
    map_op,
    retract_aggregate_op,
    retracting_join_op,
    streaming_topn_op,
)
from incubator_flink_spark.streaming.retract_join import retracting_join_stream
from incubator_flink_spark.streaming.stateful import streaming_topn
from tests.conftest import drain_stream

EPOCH = datetime(2024, 1, 1)
JOIN_SCHEMA = "__rowkind STRING, k BIGINT, side STRING, id BIGINT, v DOUBLE, ts TIMESTAMP"


def write_batches(spark, base, batches, schema):
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            f"{base}/__file={i:04d}"
        )


def drive(stream_df, sink, mode="update"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    drain_stream(q)


def file_stream(spark, base, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/__file=*")
    )


def gen_ops(rng, n_batches=5, n_keys=3, ops_per_batch=6):
    """Random changelog: inserts and (later-batch) deletes of live rows on
    both sides.  Returns (batches, final_left, final_right)."""
    batches = [[] for _ in range(n_batches)]
    live = {"left": [], "right": []}  # (k, id, v)
    next_id = 0
    ts = EPOCH
    for b in range(n_batches):
        for _ in range(ops_per_batch):
            ts += timedelta(seconds=1)
            side = rng.choice(["left", "right"])
            if live[side] and rng.random() < 0.35:
                row = live[side].pop(rng.randrange(len(live[side])))
                batches[b].append((DELETE, row[0], side, row[1], row[2], ts))
            else:
                k = rng.randint(1, n_keys)
                v = float(rng.randint(1, 9))
                row = (k, next_id, v)
                next_id += 1
                live[side].append(row)
                batches[b].append((INSERT, k, side, row[1], v, ts))
    return batches, live["left"], live["right"]


def batch_truth_topn(left, right, n=3):
    """Final snapshots → inner join → per-key sum of v_l * v_r → top-n
    by (sum desc, key asc)."""
    sums: dict[int, float] = {}
    for k, _lid, lv in left:
        for rk, _rid, rv in right:
            if rk == k:
                sums[k] = sums.get(k, 0.0) + lv * rv
    entries = sorted(((v, k) for k, v in sums.items()), key=lambda e: (-e[0], e[1]))
    return entries[:n]


def pipeline_ops():
    """The 3-stage composition, declared through the changelog-mode layer
    (streaming/modes.py — the FlinkChangelogModeInferenceProgram.scala:40
    analog).  The stages still run as separate relay-chained queries, but
    the edge modes are inferred/validated for the WHOLE chain up front."""
    return [
        retracting_join_op(["k"], "side", "id", "v"),
        map_op(
            "pair_product",
            lambda df: df.select(
                ROWKIND, "k", (F.col("left_value") * F.col("right_value")).alias("prod")
            ),
        ),
        retract_aggregate_op(["k"], "prod"),
        streaming_topn_op(["g"], "k", "sum_value", 3, op_col=ROWKIND),
    ]


# One seed by default: each seed drives THREE chained streaming stages
# (~40-50s each) and the pipeline logic is seed-independent; the extra
# seeds only vary the random op mix.  SPARK_GRAFT_FUZZ_FULL=1 restores
# all three for deep local runs (same seeds, same cases).
@pytest.mark.parametrize(
    "seed", [7, 21, 1234] if os.environ.get("SPARK_GRAFT_FUZZ_FULL") == "1" else [7]
)
def test_retract_pipeline_topn_matches_batch(spark, seed):
    rng = random.Random(seed)
    batches, final_left, final_right = gen_ops(rng)

    # composition-time validation: every edge mode is consumable, and the
    # inferred edge modes are exactly the protocol each stage emits
    ops = pipeline_ops()
    modes = infer_modes(INSERT_DELETE, ops)
    assert modes == [INSERT_DELETE, INSERT_DELETE, INSERT_DELETE, ALL_KINDS, INSERT_DELETE]

    # --- stage 1: retracting join ------------------------------------------
    s1_in = tempfile.mkdtemp(prefix="rp1_")
    write_batches(spark, s1_in, batches, JOIN_SCHEMA)
    s2_in = tempfile.mkdtemp(prefix="rp2_")
    joined = ops[0].transform(file_stream(spark, s1_in, JOIN_SCHEMA))

    def relay1(bdf, bid):
        bdf.coalesce(1).write.mode("overwrite").parquet(f"{s2_in}/__file={bid:04d}")

    drive(joined, relay1)

    # --- stage 2: streaming retract aggregate (sum of pair products) -------
    s2_schema = "__rowkind STRING, k BIGINT, left_id BIGINT, left_value DOUBLE, right_id BIGINT, right_value DOUBLE"
    pairs = ops[1].transform(file_stream(spark, s2_in, s2_schema))
    agg_stream = ops[2].transform(pairs)
    s3_in = tempfile.mkdtemp(prefix="rp3_")

    def relay2(bdf, bid):
        bdf.withColumn("g", F.lit(1)).coalesce(1).write.mode("overwrite").parquet(
            f"{s3_in}/__file={bid:04d}"
        )

    drive(agg_stream, relay2)

    # --- stage 3: retract-consuming global top-3 ----------------------------
    s3_schema = "__rowkind STRING, k BIGINT, sum_value DOUBLE, g INT"
    topn = ops[3].transform(file_stream(spark, s3_in, s3_schema))
    entries: set[tuple[float, int]] = set()

    def fold(bdf, _bid):
        for r in bdf.collect():
            if r[ROWKIND] == "+I":
                entries.add((r.value, r.id))
            else:
                entries.discard((r.value, r.id))

    drive(topn, fold)

    got = sorted(entries, key=lambda e: (-e[0], e[1]))
    want = batch_truth_topn(final_left, final_right)
    assert got == want, f"seed={seed}: got={got} want={want}"


def test_retract_aggregate_stream_matches_batch_form(spark):
    """Unit check: the streaming retract aggregate's folded final state ==
    the batch retract_aggregate over the whole changelog, and every key
    whose live count hits zero emits a DELETE."""
    rng = random.Random(5)
    rows = []
    live = []
    ts = EPOCH
    for _ in range(40):
        ts += timedelta(seconds=1)
        if live and rng.random() < 0.4:
            k, v = live.pop(rng.randrange(len(live)))
            rows.append((DELETE, k, v, ts))
        else:
            k, v = rng.randint(1, 3), float(rng.randint(1, 9))
            live.append((k, v))
            rows.append((INSERT, k, v, ts))
    batches = [rows[i::4] for i in range(4)]
    # re-order each slice by ts so deletes never precede their insert
    batches = [sorted(b, key=lambda r: r[3]) for b in batches]
    # slicing can still split an insert/delete pair across batches with the
    # delete first — regenerate as contiguous chunks instead
    batches = [rows[i * 10 : (i + 1) * 10] for i in range(4)]
    base = tempfile.mkdtemp(prefix="ras_")
    schema = "__rowkind STRING, k BIGINT, v DOUBLE, ts TIMESTAMP"
    write_batches(spark, base, batches, schema)
    state: dict[int, float] = {}

    def fold(bdf, _bid):
        for r in bdf.collect():
            if r[ROWKIND] in ("+I", "+U"):
                state[r.k] = r.sum_value
            elif r[ROWKIND] == "-D":
                state.pop(r.k, None)

    drive(retract_aggregate_stream(file_stream(spark, base, schema), ["k"], "v"), fold)

    batch_df = spark.createDataFrame(rows, schema)
    want = {
        r.k: r.sum_value for r in retract_aggregate(batch_df, ["k"], "v").collect()
    }
    assert state == want


# ------------------------------------------------ mode-inference validator --


def test_changelog_mode_validator_rejects_invalid_wiring():
    """The composition-time policy (FlinkChangelogModeInferenceProgram
    analog): an APPEND-ONLY consumer fed a retracting stream is rejected
    with the offending operator and row kinds named — before any query
    is wired.  Also pins the converting fix: drop_update_before turns a
    full retraction stream into upsert mode (still not append, so the
    append-only TopN stays rejected), and the retraction-consuming TopN
    variant accepts everything."""
    from incubator_flink_spark.streaming.modes import (
        INSERT_ONLY,
        UPSERT,
        drop_update_before_op,
    )

    append_topn = streaming_topn_op(["g"], "k", "sum_value", 3, op_col=None)

    # retract aggregate (produces +I/-U/+U/-D) → append-only TopN: invalid
    with pytest.raises(ChangelogModeError, match="streaming_topn.*append-only"):
        infer_modes(INSERT_DELETE, [retract_aggregate_op(["k"], "prod"), append_topn])

    # the error names the rejected kinds
    with pytest.raises(ChangelogModeError, match=r"\-D"):
        infer_modes(INSERT_DELETE, [retract_aggregate_op(["k"], "prod"), append_topn])

    # dropping -U converts to upsert mode but append-only still rejects
    modes = infer_modes(
        INSERT_DELETE, [retract_aggregate_op(["k"], "prod"), drop_update_before_op()]
    )
    assert modes[-1] == UPSERT
    with pytest.raises(ChangelogModeError):
        infer_modes(
            INSERT_DELETE,
            [retract_aggregate_op(["k"], "prod"), drop_update_before_op(), append_topn],
        )

    # insert-only upstream is fine for the append-only consumer
    assert infer_modes(INSERT_ONLY, [append_topn])[-1] == INSERT_DELETE

    # retraction-consuming variant accepts the full protocol
    full = streaming_topn_op(["g"], "k", "sum_value", 3, op_col=ROWKIND)
    assert infer_modes(INSERT_DELETE, [retract_aggregate_op(["k"], "prod"), full])[-1] == INSERT_DELETE

    # compose() must validate BEFORE wiring: transform never runs on error
    from incubator_flink_spark.streaming.modes import ChangelogOp, compose

    ran = []
    boom = ChangelogOp(
        name="boom",
        consumes=ALL_KINDS,
        produces=ALL_KINDS,
        transform=lambda df: ran.append(1) or df,
    )
    with pytest.raises(ChangelogModeError):
        compose(None, ALL_KINDS, [boom, append_topn])
    assert ran == []
