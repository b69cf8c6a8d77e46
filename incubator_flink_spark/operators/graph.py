"""Graph operators: the DataSet-iteration / Gelly slice that the rest of
the engine's scope actually needs (SURVEY.md §2.10 IterativeDataSet /
DeltaIteration -> driver-side loop; §2.11 Gelly Graph.degrees /
vertex-centric iteration as DataFrame self-joins).

Reference anchors: flink-java/.../operators/IterativeDataSet (bulk
iteration driving Gelly's ScatterGatherIteration), and
flink-libraries/flink-gelly/.../library/ConnectedComponents.java (min-id
label propagation) — re-expressed as a driver loop over declarative
DataFrame steps, Spark's idiomatic replacement for Flink's native
iterations (each step is one Catalyst-optimized join+agg; the driver only
checks convergence counts, never touches row data).

The flagship consumer is near-duplicate CLUSTERING: connected components
over the MinHash-LSH pair graph turns pairwise matches into dedup groups
(pick min doc_id per component as the canonical document).

Scale: every iteration is one shuffle of (edges ⋈ labels) keyed on vertex
id — the standard MapReduce CC pattern. Iteration count is bounded by the
component diameter (tiny for dedup clusters; for adversarial long-chain
graphs switch to large-star/small-star which converges in O(log n)
rounds — same loop skeleton, different step). Labels persist per round
and the previous round is unpersisted, so lineage stays O(1) deep
(no recursive plan growth — the driver loop IS the iteration barrier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex undirected degree (Gelly Graph.getDegrees)."""
    u = edges.select(F.col(src).alias("vertex"))
    v = edges.select(F.col(dst).alias("vertex"))
    return u.union(v).groupBy("vertex").agg(F.count(F.lit(1)).alias("degree"))


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Min-id label propagation to a fixpoint: returns (vertex, component)
    where component = min vertex id reachable. Deterministic: the fixpoint
    is unique, independent of iteration order/count.

    One shuffle per round (neighbor-min join + per-vertex min agg);
    convergence checked with a cheap changed-count per round.  If the
    fixpoint is not reached within ``max_iter`` rounds (a component with
    diameter > max_iter), a RuntimeError is raised rather than silently
    returning non-converged labels — raise ``max_iter`` for long-chain
    graphs (label propagation needs ~diameter rounds).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()
    # localCheckpoint (not persist) per round: persist caches row data but
    # the LOGICAL plan still nests the previous round, doubling the tree
    # every iteration — at ~40 rounds the 2^40-node plan OOMs the driver
    # just rendering its string.  Checkpointing truncates the plan to a
    # leaf, keeping analysis O(1) per round (use a reliable checkpoint
    # dir on a real cluster).  Prior rounds' checkpoint blocks are
    # reclaimed by Spark's ContextCleaner once the loop reassigns the
    # Python reference (storage is O(max concurrent rounds) = O(2
    # label sets), not O(iterations)) — the same applies to the
    # pagerank and two-phase-CC loops below.
    labels = e.select("u").distinct().select("u", F.col("u").alias("component")).localCheckpoint(eager=True)
    changed = -1
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels.select(F.col("u").alias("v"), "component"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        # fold the convergence flag into the SAME checkpointed round:
        # labels only ever decrease, so changed == (new < old) per row —
        # counting a materialized flag is a cheap scan, vs the old
        # new-vs-old join that cost one extra shuffle job per round
        new_full = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(F.col("component"), F.coalesce("nbr_component", "component")).alias(
                    "component"
                ),
                (F.coalesce("nbr_component", "component") < F.col("component")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_full.where(F.col("__chg")).count()
        labels = new_full.drop("__chg")
        if changed == 0:
            break
    e.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing); increase max_iter "
            "(needs ~graph diameter rounds)"
        )
    return labels.select(F.col("u").alias("vertex"), "component")


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-duplicate clusters from a pair list: (doc_id, cluster_id)
    with cluster_id = min doc_id of the connected component — the
    standard "keep one representative per duplicate group" reduction.

    Uses the two-phase (large-star/small-star) CC: near-dup graphs can
    chain (A~B~C~...), and min-id label propagation pays one round per
    hop of that chain while star contraction converges in O(log n)
    rounds — measured 2x faster on a diameter-20 dedup graph and the
    only shape that survives a 100 TB corpus whose duplicate chains are
    unbounded.  Identical (vertex, min-id component) fixpoint."""
    cc = connected_components_twophase(pairs, src=id_a, dst=id_b)
    return cc.select(F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id"))


def pagerank(
    edges_w: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank, the reference's flagship bulk-iteration example
    (flink-examples-batch/.../graph/PageRank.java; Gelly
    library/PageRank.java) as a driver loop of declarative steps:
    p'(v) = 0.15 + 0.85 * sum_u p(u) * w(u,v) / W(u) over a fixed
    iteration count (the unnormalized Brin-Page form; dangling mass is
    dropped — the same simplification the reference example makes).

    Determinism for the oracle: the teleport/damping constants are the
    plain literals 0.15 and 0.85 (never derived from each other — 1-0.85
    is a DIFFERENT double), per-edge contributions are computed with one
    expression shape (p * w / W), and the per-vertex sum is
    decimal(38,18)-exact so partial-aggregation order cannot perturb it.

    Scale: each iteration is one shuffle keyed on the destination vertex
    (contribution join + agg); out-weights ride on the edge rows via a
    window sum (no edges-vs-aggregate self-join), and each round's ranks
    are localCheckpoint-ed so lineage stays O(1) deep and the
    edge-lineage never appears on both sides of the contribution join
    (on a real cluster use a reliable checkpoint dir instead of the
    executor-local variant)."""
    from pyspark.sql import Window as W

    ew = edges_w.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), F.col(weight).alias("__w")
    )
    # out-weight via window over the same shuffle key — avoids joining ew
    # against its own aggregate (an analyzer-ambiguous self-join); note the
    # name must differ from __w by more than case (Spark resolution is
    # case-insensitive by default)
    ewn = ew.withColumn("__outw", F.sum("__w").over(W.partitionBy("__src"))).persist()
    # derive nodes FROM the persisted ewn (not the raw ew): the eager
    # checkpoint below is the first materialization, so routing it
    # through ewn caches the upstream edge lineage once — deriving from
    # ew would execute a potentially expensive edge derivation twice
    # (once here uncached, once when the loop first touches ewn)
    nodes = (
        ewn.select(F.col("__src").alias("node"))
        .union(ewn.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0).alias("p")).localCheckpoint(eager=True)
    try:
        for _ in range(iters):
            r = ranks.select(F.col("node").alias("__rsrc"), F.col("p").alias("__p"))
            contrib = ewn.join(r, ewn["__src"] == r["__rsrc"]).select(
                F.col("__dst").alias("node"),
                (F.col("__p") * F.col("__w") / F.col("__outw")).cast("decimal(38,18)").alias("c"),
            )
            mass = contrib.groupBy("node").agg(F.sum("c").cast("double").alias("mass"))
            ranks = (
                nodes.join(mass, "node", "left")
                .select(
                    "node",
                    (F.lit(0.15) + F.lit(0.85) * F.coalesce("mass", F.lit(0.0))).alias("p"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        ewn.unpersist()
    return ranks


def connected_components_twophase(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Large-star / small-star connected components (public algorithm:
    Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
    2014): alternating rounds rewire every vertex's larger neighbors
    (large-star) and smaller-or-equal neighbors (small-star) to the
    neighborhood minimum, converging to per-component stars around the
    minimum id in O(log n) rounds — the scale path for graphs whose
    diameter makes per-hop label propagation (``connected_components``,
    ~diameter rounds) impractical.  Same (vertex, component) fixpoint.

    Each round is two join+agg passes keyed on vertex id; the edge set
    only shrinks toward the star form, and rounds are localCheckpoint-ed
    so lineage stays O(1) deep (use a reliable checkpoint dir on a real
    cluster)."""
    from pyspark.sql import Window as W

    # checkpoint the raw edge list ONCE before deriving vertices and e:
    # both are materialized eagerly below, and without this the upstream
    # lineage (often an expensive candidate-pair generation, e.g.
    # minhash/LSH joins feeding dedup_clusters) would execute twice
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(eager=True)
    # vertex set from the RAW edges: a vertex whose only edges are
    # self-loops must still appear (own singleton component), matching
    # connected_components' output exactly
    vertices = (
        raw.select(F.col("u").alias("vertex"))
        .union(raw.select(F.col("v").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # store edges CANONICALLY oriented (u > v).  _sym symmetrizes every
    # round, so orientation is invisible to the star steps (the
    # symmetric closure is identical) — but it makes the per-round
    # directed distinct-edge count EQUAL to the canonical undirected
    # count, which closes the old gate's edge case (directed counts
    # could differ while canonical sets matched, delaying the fixpoint
    # probe a round) and lets the exact-diff job skip its own
    # least/greatest+distinct normalization passes.  Small/large-star
    # outputs are canonical by construction (every emitted edge points
    # from a vertex to a strictly smaller neighborhood minimum).
    e = (
        raw.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(df: DataFrame) -> DataFrame:
        return df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))

    # neighborhood minimum via a window keyed on u: ONE hash(u) exchange
    # per star step carries both the min computation and the per-edge
    # rewiring that consumed it — the old groupBy(u).min + join pair
    # paid the same exchange twice, plus a third for an intermediate
    # distinct whose only effect was multiset (never set) dedup
    # (guide §2.4 "two operations keyed the same way share one
    # exchange").  6 exchange stages per round -> 3.
    _m = F.least(F.min("v").over(W.partitionBy("u")), F.col("u"))

    converged = False
    prev_cnt = None
    for _ in range(max_iter):
        nbm = _sym(e).select("u", "v", _m.alias("m"))
        # large-star: rewire every larger neighbor v to the minimum.
        # Kept as a multiset (no distinct): duplicates cannot change the
        # window minimum in the small-star step, and the round's final
        # distinct collapses them before the set is compared/kept.
        large = (
            nbm.where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        nbm2 = _sym(large).select("u", "v", _m.alias("m"))
        small = (
            nbm2.where(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(nbm2.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixpoint: canonical (undirected-normalized) edge sets equal.
        # Gate the exact symmetric-difference job behind a cheap edge
        # count over the two checkpointed leaves: unequal counts prove
        # the sets differ, so the shuffle runs only on the rounds that
        # might BE the fixpoint (typically once) instead of every round
        # (guide §2.4 — one fewer shuffle job per round).  Both sides
        # are canonically oriented, so these counts ARE the canonical
        # undirected counts (gate exact, no delayed round).  Exactness
        # of convergence is untouched: it is still declared only by the
        # zero symmetric difference.
        new_cnt = small.count()
        diff = 1
        if prev_cnt is None or new_cnt == prev_cnt:
            diff = (
                e.withColumn("__s", F.lit(1))
                .unionAll(small.withColumn("__s", F.lit(-1)))
                .groupBy("u", "v")
                .agg(F.sum("__s").alias("__d"))
                .where(F.col("__d") != 0)
                .count()
            )
        prev_cnt = new_cnt
        e = small
        if diff == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_twophase did not converge within max_iter={max_iter} "
            "rounds (expected O(log n)); raise max_iter"
        )
    nbf = _sym(e)
    labels = (
        nbf.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("vertex"), F.least("mn", F.col("u")).alias("component"))
    )
    return (
        vertices.join(labels, "vertex", "left")
        .select("vertex", F.coalesce("component", F.col("vertex")).alias("component"))
    )


def triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst", assume_canonical: bool = False
) -> DataFrame:
    """Distinct triangles (a, b, c) with a < b < c of the undirected graph
    (Gelly library TriangleEnumerator analog: flink-libraries/flink-gelly/
    .../library/TriangleEnumerator.java).

    Degree-based edge orientation, exactly the trick TriangleEnumerator
    uses to bound wedge count: each edge is oriented from its endpoint
    with the smaller (degree, id) pair to the larger, and wedges are
    generated at the LOWER-degree endpoint.  A vertex then emits at most
    C(d',2) wedges where d' counts only its higher-degree neighbors —
    O(m^1.5) total wedges on any graph, vs O(deg_max^2) at a hub under
    naive id ordering (a star graph's center would otherwise emit C(n,2)
    wedges into one partition).  The order is the (degree, id) pair
    itself, compared as a struct — no rank assignment pass (a global
    row_number would be its own single-partition bottleneck), just one
    degree aggregate and two degree-attach joins keyed on vertex id.
    After the membership join closes the wedge, the triple is re-sorted
    into original-id order — the orientation is invisible to callers and
    oracles.

    ``assume_canonical=True`` lets callers that already hold distinct
    (a < b) edges (the ktruss peel maintains that invariant every round)
    skip the re-normalization passes.  The oriented edge table is pinned
    with ``localCheckpoint``: it feeds BOTH wedge sides and the closing
    join, so without the pin the scan+degree+orientation subtree
    executed three times per enumeration (guide §5 persist-when-reused —
    the r10 verify_jaccard pattern)."""
    if assume_canonical:
        e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        e0 = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
    deg = (
        e0.select(F.col("a").alias("vertex"))
        .union(e0.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    da = deg.select(F.col("vertex").alias("a"), F.col("__deg").alias("__da"))
    db = deg.select(F.col("vertex").alias("b"), F.col("__deg").alias("__db"))
    ka = F.struct(F.col("__da").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("__db").alias("d"), F.col("b").alias("i"))
    # orient: u = endpoint with the smaller (degree, id), carrying both the
    # id (for the closing join / output) and the order key (for the wedge
    # ordering condition)
    e = (
        e0.join(da, "a")
        .join(db, "b")
        .select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(ka < kb, kb).otherwise(ka).alias("vk"),
        )
        .localCheckpoint(eager=True)
    )
    uv = e.select("u", "v", "vk")
    uw = e.select(F.col("u").alias("u2"), F.col("v").alias("w"), F.col("vk").alias("wk"))
    # wedges pivot at the lower-degree endpoint u; v before w in degree order
    wedges = uv.join(uw, (uv["u"] == uw["u2"]) & (uv["vk"] < uw["wk"])).select(
        "u", "v", "w"
    )
    # the closing edge {v, w} is stored oriented by the same (degree, id)
    # order, and v < w in that order — so it appears exactly as (v, w):
    # a plain equi-join closes the wedge
    vw = e.select(F.col("u").alias("v3"), F.col("v").alias("w3"))
    closed = wedges.join(vw, (wedges["v"] == vw["v3"]) & (wedges["w"] == vw["w3"]))
    tri = F.array_sort(F.array("u", "v", "w"))
    return closed.select(
        tri.getItem(0).alias("a"), tri.getItem(1).alias("b"), tri.getItem(2).alias("c")
    )


def vertex_triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst", assume_canonical: bool = False
) -> DataFrame:
    """(vertex, n_triangles): how many triangles each vertex belongs to —
    the local clustering-coefficient numerator."""
    t = triangles(edges, src, dst, assume_canonical=assume_canonical)
    # explode, not 3-way union: the union form carried the whole triangle
    # enumeration subtree three times in the plan (re-executed per arm);
    # explode emits the identical (a, b, c) multiset from ONE enumeration
    verts = t.select(F.explode(F.array("a", "b", "c")).alias("vertex"))
    return verts.groupBy("vertex").agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficient(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Local clustering coefficient (Gelly library
    LocalClusteringCoefficient analog): per vertex,
    2*T(v) / (deg(v) * (deg(v)-1)) over the simple undirected graph —
    the fraction of a vertex's neighbor pairs that are themselves
    connected.  (vertex, degree, n_triangles, coeff); vertices of degree
    < 2 have coefficient 0.  Reuses the triangle enumeration (wedge
    join) plus one distinct-neighbor degree aggregate."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("vertex"))
        .union(e.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = vertex_triangle_counts(e, "a", "b", assume_canonical=True)
    return (
        deg.join(tri, "vertex", "left")
        .select(
            "vertex",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
    )


def sssp(
    edges: DataFrame,
    source,
    iters: int = 15,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Single-source shortest paths (Gelly library analog:
    flink-libraries/flink-gelly/.../library/SingleSourceShortestPaths.java,
    a scatter-gather min-distance iteration) as a driver loop of
    Bellman-Ford relaxation rounds over the undirected graph: each round
    is ONE join + min-aggregate shuffle keyed on vertex id, and after
    round t the table holds the exact minimum distance over paths of
    <= t edges.  ``iters`` is a FIXED round count (not a convergence
    loop) so the result is the same deterministic function of the input
    on any engine — an oracle unrolling the same rounds matches exactly;
    pick iters >= graph diameter for the true fixpoint.  Unit edge
    weight by default (hop distance, exact integers); pass ``weight``
    for weighted relaxation (use exact-decimal weights if cross-engine
    determinism matters).  Rounds are localCheckpoint-ed so lineage
    stays O(1) deep, the same discipline as the other loops here."""
    w_expr = F.col(weight) if weight else F.lit(1)
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w_expr.alias("w"))
    e = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    # seed from the edge table itself (type-agnostic, and validates the
    # source actually exists in the graph)
    dist = (
        e.select(F.col("u").alias("vertex"))
        .where(F.col("u") == F.lit(source))
        .distinct()
        .select("vertex", F.lit(0).cast("bigint").alias("dist"))
        .localCheckpoint(eager=True)
    )
    if dist.count() == 0:
        raise ValueError(f"sssp source {source!r} has no edges in the graph")
    try:
        for _ in range(iters):
            relax = (
                e.join(dist.select(F.col("vertex").alias("u"), "dist"), "u")
                .select(F.col("v").alias("vertex"), (F.col("dist") + F.col("w")).alias("dist"))
            )
            dist = (
                dist.union(relax)
                .groupBy("vertex")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True)
            )
    finally:
        e.unpersist()
    return dist


def neighborhood_similarity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Link prediction over the undirected simple graph (Gelly library
    analogs: flink-libraries/flink-gelly/.../library/similarity/
    JaccardIndex.java and AdamicAdar.java): for every vertex pair with at
    least one common neighbor, (u, v, common, jaccard, ra, adamic_adar)
    where jaccard = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|, ra is the
    resource-allocation index sum 1/deg(m) (Zhou et al. 2009 — the
    libm-free variant, exact rationals), and adamic_adar the classic
    sum 1/ln(deg(m)) with each term rounded to 9 decimals before the
    exact-decimal sum (a 1-ulp ln() difference between engines sits
    ~1e-16 below the rounding boundary).

    Shape: pairs are generated at their common neighbor (one self-join
    of the adjacency keyed on the middle vertex) — work and output are
    both proportional to the true pair count sum C(deg(m), 2), the same
    bound the reference's group-pairing has; degree terms ride the
    middle vertex's rows so no per-pair degree join exists.  A final
    (pair)-keyed aggregate + two degree joins produce the scores."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).select(
        F.col("a").alias("m"), F.col("b").alias("n")
    )
    deg = adj.groupBy("m").agg(F.count(F.lit(1)).alias("deg"))
    adjd = adj.join(deg, "m")  # (m, n, deg(m)): degree rides the middle rows
    l = adjd.select(F.col("m"), F.col("n").alias("u"), F.col("deg"))
    r = adjd.select(F.col("m").alias("m2"), F.col("n").alias("v"))
    wedges = l.join(r, (l["m"] == r["m2"]) & (l["u"] < r["v"])).select(
        "u", "v", "deg"
    )
    aa_term = F.round(F.lit(1.0) / F.log(F.col("deg").cast("double")), 9)
    pairs = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum((F.lit(1.0) / F.col("deg")).cast("decimal(30,12)")).alias("__ra"),
            F.sum(aa_term.cast("decimal(30,12)")).alias("__aa"),
        )
    )
    du = deg.select(F.col("m").alias("u"), F.col("deg").alias("__du"))
    dv = deg.select(F.col("m").alias("v"), F.col("deg").alias("__dv"))
    return (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common",
            F.round(
                F.col("common") / (F.col("__du") + F.col("__dv") - F.col("common")), 6
            ).alias("jaccard"),
            F.round(F.col("__ra").cast("double"), 6).alias("ra"),
            F.round(F.col("__aa").cast("double"), 6).alias("adamic_adar"),
        )
    )


def label_propagation(
    edges: DataFrame, iters: int = 5, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Synchronous label propagation (Gelly library analogs:
    CommunityDetection.java / LabelPropagation.java): every vertex
    starts as its own label; each round every vertex adopts its
    neighbors' most frequent label, ties to the smallest label —
    deterministic, so a FIXED round count is an engine-independent
    function of the input (oracle-unrollable, like sssp).  Each round is
    one edge-join + (vertex, label) count + per-vertex argmax; rounds
    localCheckpoint so lineage stays O(1) deep."""
    from pyspark.sql import Window as W

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    labels = (
        e.select("u")
        .distinct()
        .select("u", F.col("u").alias("label"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(iters):
            freq = (
                e.join(labels.select(F.col("u").alias("v"), "label"), "v")
                .groupBy("u", "label")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            w = W.partitionBy("u").orderBy(F.col("c").desc(), F.col("label"))
            labels = (
                freq.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .select("u", "label")
                .localCheckpoint(eager=True)
            )
    finally:
        e.unpersist()
    return labels.select(F.col("u").alias("vertex"), F.col("label").alias("community"))


def hits(
    edges: DataFrame, iters: int = 5, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """HITS hubs-and-authorities (Gelly library analog:
    flink-libraries/flink-gelly/.../library/linkanalysis/HITS.java) over
    the DIRECTED edge set: auth(v) = sum of hub over in-edges, hub(u) =
    sum of auth over out-edges, each score vector L2-normalized per
    round.  Fully deterministic across engines: sums are decimal-exact
    over identical doubles, and the only non-rational op is sqrt —
    IEEE-correctly-rounded everywhere, unlike exp/ln.  One shuffle per
    half-step keyed on the receiving vertex; norms are 1-row aggregates.
    Returns (vertex, hub, auth) rounded to 6 decimals."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct().persist()
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.select("node", F.lit(1.0).alias("h")).localCheckpoint(eager=True)

    def _norm(df: DataFrame, col: str) -> DataFrame:
        n2 = df.agg(
            F.sum((F.col(col) * F.col(col)).cast("decimal(38,18)")).cast("double").alias("__n2")
        )
        return (
            df.crossJoin(F.broadcast(n2))
            .select("node", (F.col(col) / F.sqrt("__n2")).alias(col))
        )

    try:
        auth = None
        for _ in range(iters):
            auth = (
                e.join(hub.select(F.col("node").alias("u"), "h"), "u")
                .groupBy(F.col("v").alias("node"))
                .agg(F.sum(F.col("h").cast("decimal(38,18)")).cast("double").alias("a"))
            )
            auth = (
                nodes.join(auth, "node", "left")
                .select("node", F.coalesce("a", F.lit(0.0)).alias("a"))
            )
            auth = _norm(auth, "a").localCheckpoint(eager=True)
            hub = (
                e.join(auth.select(F.col("node").alias("v"), "a"), "v")
                .groupBy(F.col("u").alias("node"))
                .agg(F.sum(F.col("a").cast("decimal(38,18)")).cast("double").alias("h"))
            )
            hub = (
                nodes.join(hub, "node", "left")
                .select("node", F.coalesce("h", F.lit(0.0)).alias("h"))
            )
            hub = _norm(hub, "h").localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return (
        hub.join(auth, "node")
        .select(
            F.col("node").alias("vertex"),
            F.round("h", 6).alias("hub"),
            F.round("a", 6).alias("auth"),
        )
    )


def summarize_graph(
    edges: DataFrame,
    groups: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertex: str = "vertex",
    group: str = "group",
) -> DataFrame:
    """Graph summarization (Gelly library analog:
    flink-libraries/flink-gelly/.../library/Summarization.java): contract
    every vertex to its group; output one super-edge per group pair with
    the count of underlying edges (canonical group_a <= group_b,
    self-group edges kept — they count intra-group connectivity).  Two
    vertex-keyed relabel joins + one (group_a, group_b) aggregate."""
    g1 = groups.select(F.col(vertex).alias("__sv"), F.col(group).alias("__ga"))
    g2 = groups.select(F.col(vertex).alias("__dv"), F.col(group).alias("__gb"))
    return (
        edges.select(F.col(src).alias("__sv"), F.col(dst).alias("__dv"))
        .join(g1, "__sv")
        .join(g2, "__dv")
        .select(
            F.least("__ga", "__gb").alias("group_a"),
            F.greatest("__ga", "__gb").alias("group_b"),
        )
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


def global_clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One-row (n_triangles, n_wedges, coeff) — the global clustering
    coefficient 3*T / W with W = sum over vertices of C(deg, 2) (Gelly
    library GlobalClusteringCoefficient.java analog).  Reuses the
    degree-oriented triangle enumeration; the wedge total is one degree
    aggregate."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    tri = triangles(e, "a", "b", assume_canonical=True).agg(F.count(F.lit(1)).alias("n_triangles"))
    wedges = (
        e.select(F.col("a").alias("vertex"))
        .union(e.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint").alias("n_wedges"))
    )
    return tri.crossJoin(wedges).select(
        "n_triangles",
        "n_wedges",
        F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6).alias("coeff"),
    )


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct canonical (a <= b) edges of the simple undirected graph —
    self-loops dropped, direction and multiplicity collapsed."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    """(vertex, deg) over canonical edges — one union + one aggregate."""
    return (
        e.select(F.col("a").alias("vertex"))
        .union(e.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def vertex_metrics(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """One-row whole-graph vertex metrics (Gelly analog:
    flink-libraries/flink-gelly/.../library/metric/undirected/
    VertexMetrics.java — vertexCount, edgeCount, tripletCount,
    maximumDegree, maximumTriplets, plus the derived averageDegree and
    density the Result class exposes).

    Scale shape: one degree aggregate keyed on vertex id, then a single
    global aggregate — every statistic is an algebraic (sum/max/count)
    combine, so the whole analytic is two map-side-combinable shuffles
    regardless of graph size; nothing is ever collected per-vertex."""
    deg = _degrees(_canonical_edges(edges, src, dst))
    n = F.count(F.lit(1))
    sum_deg = F.sum("deg")
    return deg.agg(
        n.alias("n_vertices"),
        (sum_deg / 2).cast("bigint").alias("n_edges"),
        F.sum((F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint"))
        .cast("bigint")
        .alias("n_triplets"),
        F.max("deg").alias("max_degree"),
        F.max((F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint")).alias(
            "max_triplets"
        ),
        F.round(sum_deg.cast("double") / n, 6).alias("avg_degree"),
        F.round(sum_deg.cast("double") / (n * (n - F.lit(1))), 6).alias("density"),
    )


def edge_metrics(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """One-row whole-graph edge metrics (Gelly analog: .../metric/
    undirected/EdgeMetrics.java): per vertex v with degree d, let l be
    the number of neighbors ranking HIGHER than v in (degree, id) order
    (EdgeMetrics.EdgeStats's low-order count).  Then triangle triplets
    = C(l, 2) (the degree-oriented wedges pivoted at v — every triangle
    is counted at exactly one vertex) and rectangle triplets
    = C(l, 2) + l * (d - l); the analytic reports the sums and maxima.

    Scale shape: degrees, one degree-attach join pair on the canonical
    edge list, a per-vertex sum, and a global algebraic aggregate — the
    same two-shuffle profile as ``vertex_metrics`` plus the edge-keyed
    orientation join; no wedge is materialized (the counts are
    closed-form in l and d)."""
    # pin the canonical edge set: it feeds both degree-union arms AND
    # the orientation join below — without the pin the (often expensive)
    # upstream edge derivation executed three times (guide §5)
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    deg = _degrees(e)
    da = deg.select(F.col("vertex").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("vertex").alias("b"), F.col("deg").alias("__db"))
    ka = F.struct(F.col("__da").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("__db").alias("d"), F.col("b").alias("i"))
    # each canonical edge contributes one low-order count to its
    # lower-(degree, id) endpoint
    low1 = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("vertex"),
        )
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("l"))
    )
    per_vertex = deg.join(low1, "vertex", "left").select(
        "deg", F.coalesce("l", F.lit(0)).alias("l")
    )
    tt = (F.col("l") * (F.col("l") - 1) / 2).cast("bigint")
    rt = (tt + F.col("l") * (F.col("deg") - F.col("l"))).cast("bigint")
    return per_vertex.agg(
        F.sum(tt).cast("bigint").alias("n_triangle_triplets"),
        F.sum(rt).cast("bigint").alias("n_rectangle_triplets"),
        F.max(tt).alias("max_triangle_triplets"),
        F.max(rt).alias("max_rectangle_triplets"),
    )


def triadic_census(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """One-row undirected triadic census (Gelly analog: .../clustering/
    undirected/TriadicCensus.java): counts of vertex triples with 0, 1,
    2, and 3 connecting edges, derived closed-form from four scalars —
    vertex count n, edge count m, triplet (wedge) count w, triangle
    count t — exactly the identities TriadicCensus.java:100-123 uses:
    triads3 = t; triads2 = w - 3t; triads1 = m*(n-2) - 2*triads2 -
    3*triads3; triads0 = C(n,3) - triads1 - triads2 - triads3.

    Scale shape: the only non-trivial input is the triangle count, which
    reuses the degree-oriented enumeration from ``triangles`` (bounded
    wedge generation); everything else is one degree aggregate.  The
    final arithmetic runs on a 1x1 cross join of two single-row frames."""
    e = _canonical_edges(edges, src, dst)
    base = _degrees(e).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("deg") / 2).cast("bigint").alias("m"),
        F.sum((F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint"))
        .cast("bigint")
        .alias("w"),
    )
    tri = triangles(e, "a", "b", assume_canonical=True).agg(F.count(F.lit(1)).alias("t"))
    n, m, w, t = F.col("n"), F.col("m"), F.col("w"), F.col("t")
    t2 = w - 3 * t
    t1 = m * (n - 2) - 2 * t2 - 3 * t
    return (
        base.crossJoin(tri)
        .select(
            (
                (n * (n - 1) * (n - 2) / 6).cast("bigint") - t1 - t2 - t
            ).alias("triads0"),
            t1.cast("bigint").alias("triads1"),
            t2.cast("bigint").alias("triads2"),
            t.cast("bigint").alias("triads3"),
        )
    )


def average_clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One-row (n_vertices, avg_coeff) — the mean of the per-vertex local
    clustering coefficients, degree-<2 vertices contributing 0 (Gelly
    analog: .../clustering/undirected/AverageClusteringCoefficient.java,
    which sums LocalClusteringCoefficient scores the same way).  Reuses
    ``clustering_coefficient``; the average is one algebraic aggregate
    over its per-vertex output."""
    cc = clustering_coefficient(edges, src, dst)
    return cc.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.round(
            F.sum(F.col("coeff").cast("decimal(30,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_coeff"),
    )


def kcore(edges: DataFrame, k: int, src: str = "src", dst: str = "dst") -> DataFrame:
    """(vertex, core_degree): the k-core — the maximal subgraph in which
    every vertex has degree >= k (public: Seidman 1983; the degeneracy
    measure curation pipelines use to isolate densely self-linked spam
    clusters).  Iterative peel on the canonical simple graph: drop
    vertices with degree < k, restrict edges to survivors, repeat to
    fixpoint.

    Scale shape: each round is one degree aggregate + two semi-joins on
    8-byte-hashable vertex keys, all candidate-proportional; the loop
    localCheckpoints per round (the O(1)-plan discipline of the CC and
    PageRank loops) and terminates in at most O(peel-depth) rounds —
    bounded by the degeneracy, which is tiny for web-scale sparse
    graphs.  Only the per-round vertex COUNT reaches the driver."""
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    n_prev = -1
    while True:
        sym = e.select(F.col("a").alias("v")).unionAll(e.select(F.col("b").alias("v")))
        deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("core_degree"))
        keep = deg.where(F.col("core_degree") >= k).localCheckpoint(eager=True)
        n = keep.count()
        if n == n_prev or n == 0:
            return keep.select(F.col("v").alias("vertex"), "core_degree").orderBy("vertex")
        n_prev = n
        e = (
            e.join(keep.select(F.col("v").alias("a")), "a", "semi")
            .join(keep.select(F.col("v").alias("b")), "b", "semi")
            .localCheckpoint(eager=True)
        )


def personalized_pagerank(
    edges_w: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    seed_node: str = "node",
    seed_mass: str = "s",
) -> DataFrame:
    """Personalized PageRank (public: Page et al. 1999 §6 'personalized'
    teleport; Gelly's PageRank with a non-uniform intial/teleport
    vector): p'(v) = 0.15 * s(v) + 0.85 * sum_u p(u) * w(u,v) / W(u),
    started AT the seed distribution — random walks restart only at the
    seed set, so scores measure proximity TO the seeds (the
    related-entity / topic-affinity query curation runs on co-occurrence
    graphs).

    Same determinism and scale discipline as ``pagerank``: literal
    damping constants, decimal(38,18)-exact contribution sums, one
    dst-keyed shuffle per round, O(1) lineage via localCheckpoint.  The
    seed vector joins in as a broadcast (seed sets are query-sized)."""
    from pyspark.sql import Window as W

    ew = edges_w.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), F.col(weight).alias("__w")
    )
    ewn = ew.withColumn("__outw", F.sum("__w").over(W.partitionBy("__src"))).persist()
    sd = seeds.select(F.col(seed_node).alias("node"), F.col(seed_mass).alias("__s"))
    # nodes FROM the persisted ewn so the first eager materialization
    # caches the upstream edge lineage once (see pagerank above)
    nodes = (
        ewn.select(F.col("__src").alias("node"))
        .union(ewn.select(F.col("__dst").alias("node")))
        .distinct()
        .join(F.broadcast(sd), "node", "left")
        .select("node", F.coalesce("__s", F.lit(0.0)).alias("s"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.col("s").alias("p")).localCheckpoint(eager=True)
    try:
        for _ in range(iters):
            r = ranks.select(F.col("node").alias("__rsrc"), F.col("p").alias("__p"))
            contrib = ewn.join(r, ewn["__src"] == r["__rsrc"]).select(
                F.col("__dst").alias("node"),
                (F.col("__p") * F.col("__w") / F.col("__outw")).cast("decimal(38,18)").alias("c"),
            )
            mass = contrib.groupBy("node").agg(F.sum("c").cast("double").alias("mass"))
            ranks = (
                nodes.join(mass, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(0.15) * F.col("s")
                        + F.lit(0.85) * F.coalesce("mass", F.lit(0.0))
                    ).alias("p"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        ewn.unpersist()
    return ranks


def landmark_bfs(
    edges: DataFrame,
    k_landmarks: int = 3,
    iters: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS from the top-degree landmark vertices — the
    landmark (pivot) scheme for approximating closeness centrality on
    graphs where all-pairs BFS is impossible (k BFS sweeps instead of n;
    the classic pivot estimator of Eppstein & Wang 2004).  Landmarks are
    the k highest-degree vertices (ties: vertex id ascending — a
    deterministic top-k, TakeOrdered, no global sort shuffle).  Rounds
    are FIXED (not convergence-tested) so an oracle unrolling the same
    rounds matches exactly; state is (landmark, vertex, dist) — k·|V|
    rows, each round one join + min-aggregate shuffle, localCheckpoint-ed
    to keep lineage O(1).  Returns (lm, vertex, dist)."""
    p = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Pin the symmetric edge table ALREADY HASH-PARTITIONED on the join
    # key u (explicit partition count — exempt from AQE coalescing, so
    # the partitioning is stable across rounds): the old persist kept
    # the distinct's (u, v) partitioning, which the per-round join on u
    # could not reuse, so every round re-exchanged the cached edges.
    # The distinct itself rides the same hash(u) exchange
    # (ClusteredDistribution(u, v) is satisfied by hash(u)) — guide §2.4.
    e = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .repartition(p, "u")
        .dropDuplicates(["u", "v"])
        .persist()
    )
    # degree agg reuses the pinned hash(u) partitioning: no exchange
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    lms = deg.orderBy(F.col("degree").desc(), F.col("u").asc()).limit(k_landmarks)
    dist = lms.select(
        F.col("u").alias("lm"),
        F.col("u").alias("vertex"),
        F.lit(0).cast("bigint").alias("dist"),
    ).repartition(p, "vertex").localCheckpoint(eager=True)
    try:
        for _ in range(iters):
            # dist is hash(vertex, p)-partitioned (pinned by the
            # checkpoint, alias-preserved through the rename), e is
            # hash(u, p): the join needs NO exchange on either side.
            # The round's single exchange is the repartition(vertex)
            # below, which the (lm, vertex) min-aggregate then reuses
            # (hash(vertex) clusters (lm, vertex)) and the NEXT round's
            # join reuses again — 3 exchanges per round -> 1.
            relax = e.join(
                dist.select("lm", F.col("vertex").alias("u"), "dist"), "u"
            ).select("lm", F.col("v").alias("vertex"), (F.col("dist") + 1).alias("dist"))
            dist = (
                dist.union(relax)
                .repartition(p, "vertex")
                .groupBy("lm", "vertex")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True)
            )
    finally:
        e.unpersist()
    return dist


def ktruss(
    edges: DataFrame, k: int, src: str = "src", dst: str = "dst", max_rounds: int = 20
) -> DataFrame:
    """(a, b, support): the k-truss — the maximal subgraph in which every
    edge is supported by >= k-2 triangles (public: Cohen 2008, "Trusses:
    cohesive subgraphs for social network analysis").  The edge-grain
    sibling of ``kcore``: a stricter cohesion filter curation uses to
    separate genuinely clustered communities from hub-glued ones.

    Iterative peel: per round, per-edge triangle support via the
    degree-oriented enumeration from ``triangles`` (hub-safe, O(m^1.5)
    wedges), then drop under-supported edges and repeat to fixpoint.
    Peel depth is small on sparse graphs; each round localCheckpoints so
    the plan stays O(1), and only the per-round edge COUNT reaches the
    driver.

    ``k`` must be >= 3: for k <= 2 the support threshold k-2 <= 0 means
    EVERY edge belongs to the truss, but the support inner-join would
    wrongly drop triangle-free edges — rejected loudly instead of
    returning that wrong answer.  If the peel exits via ``max_rounds``
    before reaching a fixpoint, a warning is raised (the returned edge
    set is a superset of the k-truss)."""
    import warnings

    if k < 3:
        raise ValueError(
            f"ktruss requires k >= 3 (k={k}: threshold k-2 <= 0 keeps every "
            "edge, which the support join cannot represent)"
        )
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    # Pre-filter: the k-truss is contained in the (k-1)-core (every
    # vertex of a k-truss has >= k-1 neighbors within it), and the core
    # peel is degree-only — far cheaper per round than triangle
    # enumeration.  Shrink the graph with it first.
    core = kcore(e, k - 1, "a", "b").select(F.col("vertex"))
    e = (
        e.join(core.select(F.col("vertex").alias("a")), "a", "semi")
        .join(core.select(F.col("vertex").alias("b")), "b", "semi")
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    n_prev = -1
    for _ in range(max_rounds):
        # e is canonical (a < b) and distinct every round (initial edges
        # normalized above; kept edges are a subset), so the enumeration
        # skips its re-normalization distinct.  The per-triangle edge
        # fan-out is an explode, not a 3-way union — the union form
        # re-executed the whole (pre-pin) enumeration subtree per arm.
        tri = triangles(e, "a", "b", assume_canonical=True)
        sup = (
            tri.select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("x"), F.col("b").alias("y")),
                        F.struct(F.col("a").alias("x"), F.col("c").alias("y")),
                        F.struct(F.col("b").alias("x"), F.col("c").alias("y")),
                    )
                ).alias("__p")
            )
            .select(F.col("__p.x").alias("x"), F.col("__p.y").alias("y"))
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        )
        kept = (
            e.join(sup, (e["a"] == sup["x"]) & (e["b"] == sup["y"]))
            .where(F.col("support") >= k - 2)
            .select("a", "b", "support")
            .localCheckpoint(eager=True)
        )
        n = kept.count()
        if n == n_prev or n == 0:
            return kept.orderBy("a", "b")
        n_prev = n
        e = kept.select("a", "b")
    warnings.warn(
        f"ktruss: max_rounds={max_rounds} exhausted before fixpoint "
        f"(edge count still shrinking, last={n_prev}); result is a "
        "SUPERSET of the k-truss — raise max_rounds",
        RuntimeWarning,
        stacklevel=2,
    )
    return kept.orderBy("a", "b")
