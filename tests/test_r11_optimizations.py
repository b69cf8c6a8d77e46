"""Focused tests for the round-11 optimization internals: the rank
offset broadcast path, canonical edge storage in two-phase CC, the
non-finite double literal builder, and the explode-based triangle
fan-out (each optimization that changed an operator's internals gets a
behavior pin here)."""

import math

from pyspark.sql import functions as F


def test_distributed_rank_broadcast_offsets_match_inline(spark, monkeypatch):
    """Above _OFFSETS_INLINE_MAX partitions the offsets ship as a
    broadcast join instead of an inline array literal; ranks must be
    bit-identical to the inline form (and to a global window)."""
    import random

    from pyspark.sql import Window as W

    from incubator_flink_spark.operators import rank as rank_mod

    rng = random.Random(23)
    rows = [(i, rng.randrange(40)) for i in range(911)]
    df = spark.createDataFrame(rows, "id BIGINT, v BIGINT")
    want = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(W.orderBy("v", "id")).alias("rn")).collect()
    }
    inline = {
        r["id"]: r["rank"]
        for r in rank_mod.distributed_rank(df, ["v", "id"], num_partitions=8).collect()
    }
    monkeypatch.setattr(rank_mod, "_OFFSETS_INLINE_MAX", 2)
    bcast = {
        r["id"]: r["rank"]
        for r in rank_mod.distributed_rank(df, ["v", "id"], num_partitions=8).collect()
    }
    assert inline == want and bcast == want
    # sanity pin from ADVICE r10: a permutation of 1..n, exactly
    assert sorted(bcast.values()) == list(range(1, len(rows) + 1))


def test_distributed_rank_broadcast_plan_has_no_inline_array(spark, monkeypatch):
    from incubator_flink_spark.operators import rank as rank_mod

    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("v"))
    monkeypatch.setattr(rank_mod, "_OFFSETS_INLINE_MAX", 2)
    ranked = rank_mod.distributed_rank(df, ["v", "id"], num_partitions=8)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "element_at" not in plan  # offsets are out-of-plan
    assert "BroadcastHashJoin" in plan


def test_twophase_cc_mixed_direction_duplicate_edges(spark):
    """The canonical-orientation storage must make the count gate exact
    even when the INPUT carries both directions and duplicates of the
    same undirected edge (the r10 gate compared directed counts, which
    could disagree while the canonical sets matched)."""
    from incubator_flink_spark.operators.graph import (
        connected_components,
        connected_components_twophase,
    )

    edges = (
        [(i, i + 1) for i in range(12)]
        + [(i + 1, i) for i in range(12)]  # reversed duplicates
        + [(3, 4), (4, 3), (4, 3)]  # multiplicities
        + [(50, 50)]  # self-loop-only vertex
        + [(60, 61)]
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    tp = {(r.vertex, r.component) for r in connected_components_twophase(e).collect()}
    lp = {(r.vertex, r.component) for r in connected_components(e, max_iter=30).collect()}
    assert tp == lp
    assert (50, 50) in tp  # self-loop-only vertex keeps its singleton


def test_lit_d_non_finite_doubles_parse(spark):
    """repr() of inf/nan is not valid Spark SQL; _lit_d must spell the
    CAST forms so diverged weights / degenerate centroids cannot raise
    a ParseException (ADVICE r10)."""
    from incubator_flink_spark.operators.similarity import _lit_d, _vec_sql

    vals = [1.5, float("inf"), float("-inf"), float("nan"), -0.0, 1e-308]
    row = spark.sql(f"SELECT {_vec_sql(vals)} AS v").collect()[0]["v"]
    assert row[0] == 1.5 and row[1] == math.inf and row[2] == -math.inf
    assert math.isnan(row[3])
    assert str(row[4]) == "-0.0" and row[5] == 1e-308
    # finite literals stay bit-exact round trips
    x = 0.1 + 0.2
    assert spark.sql(f"SELECT {_lit_d(x)} AS x").collect()[0]["x"] == x


def test_triangles_explode_fanout_counts(spark):
    """vertex_triangle_counts / ktruss support now fan triangles out
    with explode instead of a triple union; counts must be unchanged."""
    from incubator_flink_spark.operators.graph import (
        ktruss,
        triangles,
        vertex_triangle_counts,
    )

    # K4 (every edge in 2 triangles) + pendant + open wedge
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7), (7, 8)]
    e = spark.createDataFrame(edges, "src long, dst long")
    tri = {(r.a, r.b, r.c) for r in triangles(e).collect()}
    assert tri == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}
    counts = {r.vertex: r.n_triangles for r in vertex_triangle_counts(e).collect()}
    assert counts == {1: 3, 2: 3, 3: 3, 4: 3}
    kt = {(r.a, r.b): r.support for r in ktruss(e, 4).collect()}
    assert kt == {(1, 2): 2, (1, 3): 2, (1, 4): 2, (2, 3): 2, (2, 4): 2, (3, 4): 2}


def test_landmark_bfs_pinned_partitioning_distances(spark):
    """The single-exchange landmark_bfs rounds must produce the exact
    fixed-round BFS distances (chain + star shapes)."""
    from incubator_flink_spark.operators.graph import landmark_bfs

    # star center 0 (degree 5) + chain 0-10-11-12
    edges = [(0, i) for i in range(1, 6)] + [(0, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {(r.lm, r.vertex): r.dist for r in landmark_bfs(e, k_landmarks=1, iters=3).collect()}
    # landmark = vertex 0 (highest degree)
    assert out[(0, 0)] == 0 and out[(0, 1)] == 1 and out[(0, 10)] == 1
    assert out[(0, 11)] == 2 and out[(0, 12)] == 3
    assert len([k for k in out if k[0] == 0]) == 9
