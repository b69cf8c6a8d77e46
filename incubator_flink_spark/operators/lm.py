"""Count-based bigram language model for perplexity-style quality
filtering (public recipe: CCNet, Wenzek et al. 2020, filters web text by
reference-LM perplexity; the count-based analog keeps the whole pipeline
inside Catalyst).

Model: P(w2 | w1) = (c(w1,w2) + a) / (c(w1) + a * V) — add-a smoothing
over the bigram table, with V the corpus vocabulary size.  Scoring: a
document's mean negative log-likelihood per bigram (the log-perplexity
proxy); repetitive or templated text scores low, incoherent token soup
scores high.

Scale shape: the model is two aggregations over (w1, w2) / (w1) keys —
vocabulary-bounded outputs, tiny next to the corpus — and scoring is one
equi-join of the exploded corpus bigrams against the model (Spark
broadcasts it whenever vocabulary² fits, otherwise it's a narrow-key
shuffle) followed by a per-doc aggregate.  Everything linear in corpus
size.

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
    c12 = pair.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pair.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = docs.select(F.explode(tokens(F.col(text_col))).alias("w")).distinct().count()
    a = F.lit(SMOOTH_NUM) / F.lit(SMOOTH_DEN)
    return (
        c12.join(c1, "w1")
        .select(
            "w1",
            "w2",
            ((F.col("c12") + a) / (F.col("c1") + a * F.lit(v))).alias("prob"),
        )
    )


def doc_nll(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, nll): mean negative log-likelihood per bigram
    under the model (default: the corpus's own bigram model — the
    self-perplexity used for outlier filtering).  Documents shorter than
    2 tokens have no bigrams and are absent."""
    from incubator_flink_spark.catalog import spread

    if model is None:
        model = bigram_model(docs, text_col)
    bi = spread(docs).select(
        F.col(id_col), F.explode(shingles(tokens(F.col(text_col)), 2)).alias("bg")
    )
    pair = bi.select(
        id_col,
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
        F.split(F.col("bg"), " ").getItem(1).alias("w2"),
    )
    scored = pair.join(model, ["w1", "w2"])
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
