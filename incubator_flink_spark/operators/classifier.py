"""Linear-probe quality classifier: distributed full-batch gradient
descent over hashed bag-of-words features (the fasttext-style quality /
language scorer role in a curation pipeline, e.g. "score every document
by how English-like / how wiki-like it is" with labels from a trusted
slice).

Model: least-squares linear probe score(d) = w . x(d) with
x_j = (count of tokens hashing to bucket j) / n_tokens for j < B and a
bias feature x_B = 1.  Training is T full-batch GD steps
w <- w - lr * grad, grad_j = sum_d (w . x(d) - y(d)) * x_j(d) / N,
run as a driver loop of ONE distributed aggregate per step — the exact
discipline of the IVF/PQ k-means trainings: only the B+1 gradient sums
reach the driver per round.

Determinism (so a SQL oracle unrolling the same steps matches
bit-for-bit): squared loss instead of logistic — NO transcendental
functions anywhere, so every per-row double (x, predictions, error
terms) is the identical IEEE value in any engine; order-dependent
reductions (the per-doc dot product and the gradient sums) go through
CAST(term AS DECIMAL(38,18)) so partial-aggregation order cannot
perturb them; the weight update runs in IEEE double on identical
inputs.  Swap squared loss for logistic at the cost of libm-exactness
(a 1-ulp exp() difference between engines breaks bit-parity, not
model quality).

Scale: the feature build is one explode + (doc, bucket) aggregate;
each GD step is one join-free scan of the (sparse) feature table with a
(B+1)-row output; scoring is the same scan shape.  Everything linear in
corpus size, no shuffle wider than (doc_id, bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_flink_spark.functions.hashing import hash64
from incubator_flink_spark.functions.text import tokens

N_BUCKETS = 16
LEARNING_RATE = 0.5


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Sparse (id, j, x) features: token-count fraction per hash bucket
    plus the bias feature at j = n_buckets (x = 1.0).  Docs with no
    tokens contribute only the bias row."""
    from incubator_flink_spark.catalog import spread

    base = spread(docs).select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    cnt = (
        base.select(F.col(id_col), F.explode(F.col("__t")).alias("__w"))
        .select(F.col(id_col), (hash64(F.col("__w")) % n_buckets).cast("int").alias("j"))
        .groupBy(id_col, "j")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    ntok = base.select(F.col(id_col), F.size("__t").alias("__n")).where(F.col("__n") >= 0)
    feats = cnt.join(ntok, id_col).select(
        id_col, "j", (F.col("__c").cast("double") / F.col("__n")).alias("x")
    )
    bias = ntok.select(id_col, F.lit(n_buckets).alias("j"), F.lit(1.0).alias("x"))
    return feats.unionAll(bias)


def _pred(feats: DataFrame, w: list[float], id_col: str) -> DataFrame:
    """(id, pred): decimal-exact dot product of each doc's sparse
    features with the broadcast weight literal array."""
    # one JVM-parsed literal (py4j chatter — see similarity._vec_sql note)
    # _lit_d spells non-finite weights as CAST literals (diverged GD
    # weights would otherwise be invalid SQL — ADVICE r10)
    from incubator_flink_spark.operators.similarity import _lit_d

    warr = F.expr("array(" + ",".join(_lit_d(v) for v in w) + ")")
    term = (F.col("x") * F.element_at(warr, F.col("j") + 1)).cast("decimal(38,18)")
    return (
        feats.select(F.col(id_col), term.alias("__t"))
        .groupBy(id_col)
        .agg(F.sum("__t").cast("double").alias("pred"))
    )


def train_linear_probe(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    iters: int = 3,
    lr: float = LEARNING_RATE,
) -> list[float]:
    """Weights after ``iters`` full-batch GD steps from w = 0.  ``label``
    is a 0/1 (or real-valued) Column evaluated against ``docs``."""
    # Pre-partition both per-iteration join inputs by the doc id and pin
    # them: the cached InMemoryRelation keeps its outputPartitioning, so
    # every GD round's _pred groupBy(id), pred-vs-y join, and feats-vs-err
    # join all reuse ONE hash partitioning instead of re-exchanging three
    # times per round (guide §2.4 "two operations keyed the same way can
    # share one exchange").  Values are untouched — per-doc grouping is
    # exact and the gradient sums are order-independent decimals.
    feats = hashed_features(docs, id_col, text_col, n_buckets).repartition(id_col).persist()
    y = docs.select(F.col(id_col), label.cast("double").alias("y")).repartition(id_col).persist()
    n = docs.count()
    w = [0.0] * (n_buckets + 1)
    try:
        for _ in range(iters):
            err = (
                _pred(feats, w, id_col)
                .join(y, id_col)
                .select(F.col(id_col), (F.col("pred") - F.col("y")).alias("e"))
            )
            grads = (
                feats.join(err, id_col)
                .select("j", (F.col("e") * F.col("x")).cast("decimal(38,18)").alias("g"))
                .groupBy("j")
                .agg(F.sum("g").cast("double").alias("g"))
                .collect()
            )
            gmap = {r["j"]: r["g"] for r in grads}
            w = [w[j] - lr * (gmap.get(j, 0.0) / n) for j in range(n_buckets + 1)]
    finally:
        feats.unpersist()
        y.unpersist()
    return w


def score_linear_probe(
    docs: DataFrame,
    w: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, score): w . x rounded to 6 decimals — the trained quality
    signal, a map-side scan at any scale (weights are literals)."""
    feats = hashed_features(docs, id_col, text_col, n_buckets)
    return _pred(feats, w, id_col).select(
        id_col, F.round(F.col("pred"), 6).alias("score")
    )
