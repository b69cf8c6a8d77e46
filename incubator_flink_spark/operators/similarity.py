"""Embedding similarity search (beyond-reference training-data scope):
brute-force cosine top-k as the correctness baseline, and a
random-hyperplane LSH bucketed variant as the scale path.

Design for 100TB:
- brute-force is a broadcast of the (small) query set against the corpus —
  a map-side pass, no shuffle of the corpus; only the per-query top-k
  aggregation shuffles k rows per query.
- LSH assigns each vector to a bucket (sign pattern against NUM_PLANES
  fixed hyperplanes — deterministic constants so the DuckDB oracle can
  replicate). Candidate generation is an equi-join on bucket id, shuffling
  candidates instead of the cross product. Recall is tunable with
  multi-probe/bands; here one bucket, verified exactly by cosine.

All dot products run as Catalyst lambda expressions (zip_with/aggregate,
sequential order → deterministic); cosines are rounded to 6 decimals so
engine-order differences cannot flip comparisons.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import spread

NUM_PLANES = 8
DIM = 64

_rng = random.Random(7)
HYPERPLANES: list[list[float]] = [
    [round(_rng.uniform(-1.0, 1.0), 6) for _ in range(DIM)] for _ in range(NUM_PLANES)
]


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column, scale: int = 6) -> Column:
    """Rounded cosine similarity of two float-array columns."""
    return F.round(_dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), scale)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query by cosine (query_id, neighbor_id,
    cos, rank). Ties broken by neighbor id for determinism."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    pairs = F.broadcast(q).crossJoin(c).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def near_pairs(corpus: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold. O(n^2) — the
    correctness baseline; use lsh_topk for scale."""
    a = spread(corpus).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("vec_a"), F.col("vec_b")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def lsh_bucket(vec_col: Column) -> Column:
    """Random-hyperplane LSH bucket id: bit b = sign(dot(vec, H_b))."""
    bucket = F.lit(0)
    for b, plane in enumerate(HYPERPLANES):
        dot = _dot(vec_col, F.array(*[F.lit(w) for w in plane]))
        bucket = bucket + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket.cast("long")


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine rank within candidates. The equi-join on bucket replaces
    the cross product — this is the 100TB path."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), lsh_bucket(F.col(vec_col)).alias("bucket")
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"), lsh_bucket(F.col(vec_col)).alias("bucket")
    )
    pairs = q.join(c, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def kmeans_centroids(
    corpus: DataFrame, n_clusters: int = 8, iters: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer:
    init = the first n_clusters vectors by id (deterministic), then
    `iters` assign/average rounds. Each round is one distributed pass
    (assignment via cosine against broadcast centroids + groupBy average);
    only the k centroid vectors ever reach the driver."""
    init = (
        corpus.orderBy(id_col).limit(n_clusters).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init]
    # per-row centroid assignment is the heavy map stage: spread it, and
    # persist so the `iters` assignment passes + the caller's final
    # assignment re-read cached vectors instead of re-running scan+shuffle
    corpus = spread(corpus).persist()
    for _ in range(iters):
        assigned = corpus.select(
            F.col(id_col), F.col(vec_col), _nearest_centroid(F.col(vec_col), centroids).alias("cluster")
        )
        dim = len(centroids[0])
        sums = assigned.groupBy("cluster").agg(
            *[F.sum(F.col(vec_col).getItem(d).cast("double")).alias(f"s{d}") for d in range(dim)],
            F.count(F.lit(1)).alias("n"),
        )
        rows = {r["cluster"]: r for r in sums.collect()}
        centroids = [
            [rows[c][f"s{d}"] / rows[c]["n"] for d in range(dim)] if c in rows else centroids[c]
            for c in range(n_clusters)
        ]
    return centroids


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid by dot product (vectors ~unit norm).

    Expressed as array argmax (first index on ties) so every dot subtree
    appears exactly ONCE in the plan. The previous chained-when form
    nested each running best inside the next comparison, doubling the
    expression tree per centroid — 2^k codegen blowup that dominated
    wall time as Janino compile, not data work."""
    dots = F.array(*[_dot(vec, F.array(*[F.lit(w) for w in c])) for c in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_clusters: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer, corpus bucketed by
    nearest centroid, queries probe their n_probe nearest cells, exact
    cosine rank within the probed cells. The candidate join is an equi-join
    on cluster id — the IVF scale path (cross product / n_clusters *
    n_probe expected work)."""
    from pyspark.sql import Window as W

    centroids = kmeans_centroids(corpus, n_clusters, id_col=id_col, vec_col=vec_col)
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cluster"),
    )
    # query probes its n_probe closest centroids
    probe_sets = []
    for i, cen in enumerate(centroids):
        probe_sets.append(F.struct(_dot(F.col(vec_col), F.array(*[F.lit(w) for w in cen])).alias("d"), F.lit(i).alias("c")))
    probes = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        F.slice(F.reverse(F.array_sort(F.array(*probe_sets))), 1, n_probe).alias("cells"),
    ).select("query_id", "q_vec", F.explode(F.col("cells.c")).alias("cluster"))
    pairs = probes.join(c, "cluster").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
