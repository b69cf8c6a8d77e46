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

Pair-verify dot products run as Catalyst lambda expressions (zip_with/
aggregate, sequential order → deterministic); the banding map stage runs
as one Arrow-batched numpy matmul per batch (band_signatures_vectorized —
validated sig-identical to the expression form). Cosines are rounded to
6 decimals so engine-order differences cannot flip comparisons. Flat
element_at chains are deliberately NOT used anywhere: at DIM=64 they
blow up Janino compilation and lose badly to both forms above.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

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

# Banded LSH for threshold near-pair mining (near_pairs_lsh): NUM_BANDS
# independent bands of BAND_BITS sign-bits each.  A pair is a candidate if
# it agrees on ALL bits of at least one band; candidates are verified with
# the exact cosine.  16 bands x 4 bits gives ~0.91 theoretical recall at
# cos >= 0.35 (p = 1 - theta/pi = 0.614 per bit) with a 6.25% random
# collision rate per band.  Deterministic constants so the DuckDB oracle
# replicates the banding exactly.
BAND_BITS = 4
NUM_BANDS = 16
_rng_b = random.Random(11)
BAND_PLANES: list[list[float]] = [
    [round(_rng_b.uniform(-1.0, 1.0), 6) for _ in range(DIM)] for _ in range(BAND_BITS * NUM_BANDS)
]

# Regime math (documented because the 10x scale probe exposed it): a pair
# of UNRELATED vectors collides in a b-band/r-bit banding with probability
# 1-(1-2^-r)^b, and a pair at cosine t with probability 1-(1-p^r)^b where
# p = 1 - arccos(t)/pi.  At wide angles (t ~ 0.35, p ~ 0.61) p is too
# close to 1/2 for ANY banding to keep recall while pruning — candidate
# mass approaches all-pairs, and the probe measures ~40x wall at 10x rows.
# That is a property of sign-LSH at wide angles, not of the plan.  In the
# regime near-dup mining actually runs at 100TB (t >= ~0.8 on real
# embedding models, p >= 0.85), a deeper banding discriminates sharply:
# (12 bits, 48 bands) gives recall 0.9997 at t=0.9 with a 1.2% random
# collision rate.  near_pairs_lsh picks that banding automatically for
# threshold >= 0.6; plane constants are deterministic per configuration
# so oracles can replicate any of them.
_PLANES_CACHE: dict[tuple[int, int], list[list[float]]] = {(BAND_BITS, NUM_BANDS): BAND_PLANES}


def band_planes(bits: int, bands: int) -> list[list[float]]:
    """Deterministic hyperplanes for a (bits, bands) banding; the default
    (4, 16) config is the original BAND_PLANES constant (oracle-pinned)."""
    key = (bits, bands)
    if key not in _PLANES_CACHE:
        rng = random.Random(100 + bits * 1000 + bands)
        _PLANES_CACHE[key] = [
            [round(rng.uniform(-1.0, 1.0), 6) for _ in range(DIM)] for _ in range(bits * bands)
        ]
    return _PLANES_CACHE[key]


def banding_for_threshold(threshold: float) -> tuple[int, int]:
    """(bits, bands) giving high recall at `threshold` with the smallest
    random-collision mass: deep banding only helps when p_bit is well
    above 1/2 (see regime note above)."""
    if threshold >= 0.8:
        return (12, 48)
    if threshold >= 0.6:
        return (8, 24)
    return (BAND_BITS, NUM_BANDS)


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column, scale: int = 6) -> Column:
    """Rounded cosine similarity of two float-array columns."""
    return F.round(_dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), scale)


def norm(vec: Column) -> Column:
    """L2 norm, same expression ``cosine`` uses internally.  Computed in a
    per-SIDE projection before a pair join it turns the per-pair cost from
    three DIM-length dot folds into one (norms ride along the join as
    plain doubles) — value-identical, since the pair formula
    round(dot/(norm_a*norm_b), s) evaluates the exact same doubles."""
    return F.sqrt(_dot(vec, vec))


def _cos_norms(a: Column, b: Column, norm_a: Column, norm_b: Column, scale: int = 6) -> Column:
    return F.round(_dot(a, b) / (norm_a * norm_b), scale)


def pair_cos_vectorized(vec_a: Column, vec_b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Rounded pair cosine as one Arrow-batched numpy matmul per batch —
    the verify-stage analog of ``band_signatures_vectorized``: candidate
    volume × DIM multiplications run as BLAS instead of interpreted
    Catalyst lambda folds (the profiled hot spot of near_pairs_lsh /
    semantic_dedup at sf0.1: ~30M pair-dots). Summation order differs
    from the sequential fold (pairwise vs left fold) but both sides of
    the oracle compare already use different orders (DuckDB SUM is its
    own order); the round-to-6-decimals canonicalization absorbs the
    ~1-ulp differences — validated value-identical to the expression
    form on all testdata SFs (tests/test_operators.py)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series, na: pd.Series, nb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        d = np.einsum("ij,ij->i", A, B)
        return pd.Series(np.round(d / (na.to_numpy() * nb.to_numpy()), 6))

    return _cos(vec_a, vec_b, norm_a, norm_b)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query by cosine (query_id, neighbor_id,
    cos, rank). Ties broken by neighbor id for determinism."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), norm(F.col(vec_col)).alias("q_norm"))
    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"), norm(F.col(vec_col)).alias("n_norm"))
    pairs = F.broadcast(q).crossJoin(c).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", _cos_norms(F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")).alias("cos"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def near_pairs(corpus: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold. O(n^2) — the
    correctness baseline; use lsh_topk for scale."""
    a = spread(corpus).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), norm(F.col(vec_col)).alias("norm_a"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), norm(F.col(vec_col)).alias("norm_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _cos_norms(F.col("vec_a"), F.col("vec_b"), F.col("norm_a"), F.col("norm_b")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def band_signature(vec_col: Column, band: int) -> Column:
    """Signature of `band` (0..NUM_BANDS-1): BAND_BITS sign-bits packed.

    Catalyst-expression reference form; the hot path uses
    ``band_signatures_vectorized`` (validated sig-for-sig identical)."""
    sig = F.lit(0)
    for i in range(BAND_BITS):
        plane = BAND_PLANES[band * BAND_BITS + i]
        dot = _dot(vec_col, F.array(*[F.lit(w) for w in plane]))
        sig = sig + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig.cast("int")


_BAND_PLANES_M = np.array(BAND_PLANES, dtype=np.float64).T  # (DIM, bands*bits)


def band_signatures_vectorized(vec_col: Column, bits: int = BAND_BITS, bands: int = NUM_BANDS) -> Column:
    """All NUM_BANDS band signatures in one Arrow-batched matmul
    (batch x DIM) @ (DIM x NUM_BANDS*BAND_BITS) — the 100TB path for the
    banding map stage: one BLAS call per Arrow batch instead of
    NUM_BANDS*BAND_BITS interpreted lambda folds per ROW (the profiled
    hot spot: 64 HOF dots/row dominated near_pairs_lsh wall time).
    Sign-bit packing is integer-exact; dot signs match the Catalyst form
    except for |dot| ~ 1 ulp of 0 (measure-zero for real embeddings —
    validated identical on all testdata SFs)."""
    from pyspark.sql.functions import pandas_udf

    M = np.array(band_planes(bits, bands), dtype=np.float64).T

    @pandas_udf("array<int>")
    def _sigs(vec: pd.Series) -> pd.Series:
        V = np.stack(vec.to_numpy()).astype(np.float64)
        signs = (V @ M) > 0
        sigs = np.zeros((V.shape[0], bands), dtype=np.int32)
        for b in range(bands):
            for i in range(bits):
                sigs[:, b] |= signs[:, b * bits + i].astype(np.int32) << i
        return pd.Series(list(sigs))

    return _sigs(vec_col)


def near_pairs_lsh(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    banding: tuple[int, int] | None = None,
) -> DataFrame:
    """Banded-LSH near-pair mining: all pairs (id_a < id_b) that collide in
    at least one sign-bit band AND have exact cosine >= threshold.

    This is the 100TB shape (mirrors dedup.minhash_lsh_pairs): candidate
    generation is an equi-join on (band, signature) — work proportional to
    colliding pairs, never the cross product; the exact-cosine verify gives
    precision 1.0 within the candidate set.  Recall is the banding's
    (tunable via NUM_BANDS/BAND_BITS); the brute-force ``near_pairs``
    stays as the small-data baseline.

    ``banding`` defaults to banding_for_threshold(threshold): deep
    bandings only pay off in the near-dup regime (see the regime note at
    the BAND_PLANES definition)."""
    bits, bands = banding if banding is not None else banding_for_threshold(threshold)
    sigs = spread(corpus).select(
        F.col(id_col).alias("_id"),
        F.posexplode(band_signatures_vectorized(F.col(vec_col), bits, bands)).alias("band", "sig"),
    )
    left = sigs.select(F.col("_id").alias("id_a"), F.col("band"), F.col("sig"))
    right = sigs.select(F.col("_id").alias("id_b"), F.col("band"), F.col("sig"))
    cand = (
        left.join(right, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), norm(F.col(vec_col)).alias("norm_a"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), norm(F.col(vec_col)).alias("norm_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", pair_cos_vectorized(F.col("vec_a"), F.col("vec_b"), F.col("norm_a"), F.col("norm_b")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    banding: tuple[int, int] | None = None,
) -> DataFrame:
    """SemDeDup-style embedding-space deduplication (public recipe: drop
    documents whose embedding is within cosine ``threshold`` of a kept
    lower-id document — here the deterministic "has a smaller-id near
    neighbor" rule, so the survivor set is order-independent).

    Scale shape: candidates from the banded hyperplane LSH
    (near_pairs_lsh — equi-join on (band, signature), never all-pairs),
    exact-cosine verify, then one left-anti join of the corpus against
    the dropped-id set. All shuffles are candidate- or corpus-linear.
    """
    pairs = near_pairs_lsh(corpus, threshold, id_col=id_col, vec_col=vec_col, banding=banding)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.join(dropped, id_col, "left_anti")


def lsh_bucket(vec_col: Column) -> Column:
    """Random-hyperplane LSH bucket id: bit b = sign(dot(vec, H_b))."""
    bucket = F.lit(0)
    for b, plane in enumerate(HYPERPLANES):
        dot = _dot(vec_col, F.array(*[F.lit(w) for w in plane]))
        bucket = bucket + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket.cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_bits: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine rank within candidates. The equi-join on bucket replaces
    the cross product — this is the 100TB path.

    ``probe_bits`` > 0 enables multi-probe (public multi-probe LSH
    recipe): each query additionally probes the ``probe_bits`` buckets at
    Hamming distance 1 (one sign bit flipped — the most likely buckets
    for a near neighbor to have fallen into). Candidate volume grows
    ~(probe_bits+1)× while recall approaches exhaustive for vectors near
    the query's hyperplane boundaries; the probe expansion is a stateless
    explode on the (small) query side, so the corpus is still touched by
    one equi-join."""
    bucket0 = lsh_bucket(F.col(vec_col))
    if probe_bits:
        probe_arr = F.array(bucket0, *[bucket0.bitwiseXOR(F.lit(1 << b)) for b in range(probe_bits)])
        bucket_col = F.explode(probe_arr).alias("bucket")
    else:
        bucket_col = bucket0.alias("bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), norm(F.col(vec_col)).alias("q_norm"),
        bucket_col,
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"), norm(F.col(vec_col)).alias("n_norm"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    pairs = q.join(c, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", pair_cos_vectorized(F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")).alias("cos"))
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
    # persist so the `iters` assignment passes re-read cached vectors
    # instead of re-running scan+shuffle.  Unpersisted in `finally` so
    # library callers don't leak cached partitions for the session; the
    # caller's final assignment re-derives the (cheap) scan once.
    corpus = spread(corpus).persist()
    try:
        dim = len(centroids[0])
        for _ in range(iters):
            assigned = corpus.select(
                F.col(id_col), F.col(vec_col), _nearest_centroid(F.col(vec_col), centroids).alias("cluster")
            )
            # centroid means are decimal-exact sums (order-independent
            # across partial aggregation) divided as IEEE doubles, so an
            # independent engine (the DuckDB oracle) reproduces the
            # centroids bit-for-bit: float(exact decimal) / int is the
            # correctly-rounded double division on both sides.
            # posexplode keeps the aggregate NARROW (one decimal sum over
            # (cluster, dim) keys) instead of `dim` wide agg columns whose
            # codegen dominates wall time; only k*dim+k rows hit the driver.
            sums = (
                assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("d", "x"))
                .groupBy("cluster", "d")
                .agg(F.sum(F.col("x").cast("double").cast("decimal(30,8)")).alias("s"))
                .collect()
            )
            counts = {r["cluster"]: r["n"] for r in assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()}
            coord: dict[int, list] = {}
            for r in sums:
                coord.setdefault(r["cluster"], [None] * dim)[r["d"]] = r["s"]
            centroids = [
                [float(coord[c][d]) / counts[c] for d in range(dim)] if c in coord else centroids[c]
                for c in range(n_clusters)
            ]
    finally:
        corpus.unpersist()
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
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"), norm(F.col(vec_col)).alias("n_norm"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cluster"),
    )
    # query probes its n_probe closest centroids
    probe_sets = []
    for i, cen in enumerate(centroids):
        probe_sets.append(F.struct(_dot(F.col(vec_col), F.array(*[F.lit(w) for w in cen])).alias("d"), F.lit(i).alias("c")))
    probes = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), norm(F.col(vec_col)).alias("q_norm"),
        F.slice(F.reverse(F.array_sort(F.array(*probe_sets))), 1, n_probe).alias("cells"),
    ).select("query_id", "q_vec", "q_norm", F.explode(F.col("cells.c")).alias("cluster"))
    pairs = probes.join(c, "cluster").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", _cos_norms(F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")).alias("cos"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
