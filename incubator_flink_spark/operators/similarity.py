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
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    pairs = F.broadcast(q).crossJoin(c).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def near_pairs(corpus: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold. O(n^2) — the
    correctness baseline; use lsh_topk for scale."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
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
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"), lsh_bucket(F.col(vec_col)).alias("bucket")
    )
    pairs = q.join(c, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
