"""Count-based bigram language model for perplexity-style quality
filtering (public recipe: CCNet, Wenzek et al. 2020, filters web text by
reference-LM perplexity; the count-based analog keeps the whole pipeline
inside Catalyst).

Model: P(w2 | w1) = (c(w1,w2) + a) / (c(w1) + a * V) — add-a smoothing
over the bigram table, with V the corpus vocabulary size.  Scoring: a
document's mean negative log-likelihood per bigram (the log-perplexity
proxy); repetitive or templated text scores low, incoherent token soup
scores high.

Scale shape: the model is ONE corpus-sized aggregation over (w1, w2),
then the head-count c(w1) is a window sum over that (vocabulary-bounded)
bigram table — the same ride-the-existing-shuffle trick the pagerank
out-weight uses — so no second corpus-sized pass and no join keyed on
bare w1 exists anywhere (a stopword-head equi-join partition would be
the skew scale-killer at web-corpus vocabularies).  Scoring is one
equi-join of the exploded corpus bigrams against the model on the full
(w1, w2) key (Spark broadcasts it whenever vocabulary² fits, otherwise
it's a well-spread two-word-key shuffle) followed by a per-doc
aggregate.  Everything linear in corpus size.

Determinism for the oracle: counts are exact integers; each log term is
cast to DECIMAL(30,12) before summation (exact, order-independent — a
1-ulp libm difference between engines sits ~3 orders of magnitude below
the 12th fractional digit), and the final mean is rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_flink_spark.functions.text import shingles, tokens

SMOOTH_NUM = 1  # smoothing a = SMOOTH_NUM / SMOOTH_DEN (exact rational so
SMOOTH_DEN = 2  # both engines compute the identical double: a = 0.5)


def bigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, prob): add-0.5-smoothed bigram conditionals over the
    corpus."""
    from incubator_flink_spark.catalog import spread

    bi = spread(docs).select(F.explode(shingles(tokens(F.col(text_col)), 2)).alias("bg"))
    pair = bi.select(
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
        F.split(F.col("bg"), " ").getItem(1).alias("w2"),
    )
    from pyspark.sql import Window as W

    c12 = pair.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # c(w1) = sum over w2 of c(w1, w2): a window sum over the already-built
    # bigram table (model-sized input, exact same integers as a separate
    # corpus aggregation) instead of a second corpus pass + a join keyed on
    # bare w1 — the de-skewed form (see module docstring)
    c1 = F.sum("c12").over(W.partitionBy("w1"))
    v = docs.select(F.explode(tokens(F.col(text_col))).alias("w")).distinct().count()
    a = F.lit(SMOOTH_NUM) / F.lit(SMOOTH_DEN)
    return c12.select(
        "w1",
        "w2",
        ((F.col("c12") + a) / (c1 + a * F.lit(v))).alias("prob"),
    )


def doc_nll(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    unseen_prob: float | None = None,
) -> DataFrame:
    """(id, n_bigrams, nll): mean negative log-likelihood per bigram
    under the model (default: the corpus's own bigram model — the
    self-perplexity used for outlier filtering).  Documents shorter than
    2 tokens have no bigrams and are absent.

    With the default self-model every corpus bigram is in the model, so
    an inner join loses nothing.  With an externally supplied held-out
    model (the CCNet regime) unseen bigrams MUST NOT be dropped — that
    would deflate n_bigrams and under-penalize exactly the OOV-heavy
    documents the filter exists to catch — so callers must pass
    ``unseen_prob`` (the model's unseen-mass floor, a / (c1 + a*V) with
    c12 = 0 for a typical head) and the join becomes a left join with
    that fallback."""
    from incubator_flink_spark.catalog import spread

    if model is None:
        model = bigram_model(docs, text_col)
        if unseen_prob is not None:
            raise ValueError("unseen_prob only applies to an external model")
    elif unseen_prob is None:
        raise ValueError(
            "an external model requires unseen_prob: without it, unseen "
            "bigrams would be silently dropped and OOV-heavy documents "
            "under-penalized"
        )
    elif not 0.0 < unseen_prob < 1.0:
        raise ValueError("unseen_prob must be in (0, 1)")
    bi = spread(docs).select(
        F.col(id_col), F.explode(shingles(tokens(F.col(text_col)), 2)).alias("bg")
    )
    pair = bi.select(
        id_col,
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
        F.split(F.col("bg"), " ").getItem(1).alias("w2"),
    )
    if unseen_prob is None:
        scored = pair.join(model, ["w1", "w2"])
    else:
        scored = pair.join(model, ["w1", "w2"], "left").withColumn(
            "prob", F.coalesce("prob", F.lit(unseen_prob))
        )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.log(F.col("prob")).cast("decimal(30,12)")).alias("__s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(-F.col("__s").cast("double") / F.col("n_bigrams"), 6).alias("nll"),
        )
    )
