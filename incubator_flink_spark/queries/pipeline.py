"""Training-data curation operators beyond the dedup family
(queries/documents.py): Gopher-style repetition quality filters and
C4-style boilerplate n-gram analysis. All pure Catalyst — explode +
two-level aggregation with map-side partial agg, no UDFs — so every
shuffle key is (doc_id[, word]) and the plans scale linearly in corpus
size (public recipes: Gopher/MassiveText repetition filters, C4's
repeated-span removal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load, spread
from incubator_flink_spark.functions.text import shingles, tokens, tokens_sql
from incubator_flink_spark.operators.dedup import doc_shingle_set
from incubator_flink_spark.queries.documents import _DS_CTE
from incubator_flink_spark.queries.registry import register

_TOKS = tokens_sql("text")

# keep-thresholds (Gopher-flavored, tuned to this corpus's word-soup
# shape so both keep=1 and keep=0 rows exist at every SF)
_MAX_TOP_WORD = 0.18
_MAX_DUP_WORD = 0.55
_MAX_TOP_BIGRAM = 0.2
_MIN_WORDS = 20

QUALITY_REPETITION_ORACLE = f"""
WITH w AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
wagg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         ROUND(1.0 * MAX(c) / SUM(c), 6) AS top_word_frac,
         ROUND(1.0 - 1.0 * COUNT(*) / SUM(c), 6) AS dup_word_frac,
         ROUND(1.0 * SUM(LEN(w) * c) / SUM(c), 6) AS mean_word_len
  FROM wc GROUP BY doc_id),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(a) - 1, 0)),
                               j -> a[j] || ' ' || a[j+1])) AS g
  FROM (SELECT doc_id, {_TOKS} AS a FROM documents) t),
gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g),
gagg AS (
  SELECT doc_id, ROUND(1.0 * MAX(c) / SUM(c), 6) AS top_bigram_frac
  FROM gc GROUP BY doc_id)
SELECT w.doc_id, n_words, top_word_frac, dup_word_frac, mean_word_len,
       COALESCE(top_bigram_frac, 0.0) AS top_bigram_frac,
       CAST(CASE WHEN top_word_frac <= {_MAX_TOP_WORD}
                  AND dup_word_frac <= {_MAX_DUP_WORD}
                  AND COALESCE(top_bigram_frac, 0.0) <= {_MAX_TOP_BIGRAM}
                  AND n_words >= {_MIN_WORDS}
            THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM wagg w LEFT JOIN gagg USING (doc_id)
ORDER BY doc_id
"""


@register("quality_repetition", QUALITY_REPETITION_ORACLE)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style repetition filters: fraction of words that
    are duplicates, coverage of the most frequent word and bigram, mean
    word length, and the resulting keep decision. Two explode+agg
    pipelines (words, bigrams) joined on doc_id; every aggregation is
    partial-agg friendly (sum/max/count over (doc_id, gram))."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))

    wc = (
        d.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wagg = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_word_frac"),
        F.round(F.lit(1.0) - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_word_frac"),
        F.round(F.sum(F.length("w") * F.col("c")) / F.sum("c"), 6).alias("mean_word_len"),
    )
    gc = (
        d.select("doc_id", F.explode(shingles(toks, 2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    gagg = gc.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )
    out = wagg.join(gagg, "doc_id", "left").withColumn(
        "top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0))
    )
    keep = (
        (F.col("top_word_frac") <= _MAX_TOP_WORD)
        & (F.col("dup_word_frac") <= _MAX_DUP_WORD)
        & (F.col("top_bigram_frac") <= _MAX_TOP_BIGRAM)
        & (F.col("n_words") >= _MIN_WORDS)
    )
    return out.select(
        "doc_id",
        "n_words",
        "top_word_frac",
        "dup_word_frac",
        "mean_word_len",
        "top_bigram_frac",
        keep.cast("int").alias("keep"),
    ).orderBy("doc_id")


_BOILER_MIN_DF = 5

BOILERPLATE_ORACLE = f"""
WITH ds AS ({_DS_CTE}),
df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM ds GROUP BY shingle),
hot AS (SELECT shingle FROM df WHERE df >= {_BOILER_MIN_DF}),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM ds GROUP BY doc_id),
boil AS (
  SELECT ds.doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler
  FROM ds JOIN hot USING (shingle) GROUP BY ds.doc_id)
SELECT tot.doc_id, n_shingles,
       COALESCE(n_boiler, 0) AS n_boiler,
       ROUND(1.0 * COALESCE(n_boiler, 0) / n_shingles, 6) AS boiler_frac
FROM tot LEFT JOIN boil USING (doc_id)
ORDER BY doc_id
"""


@register("boilerplate_ngrams", BOILERPLATE_ORACLE)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate detection: 3-word shingles occurring in >=
    _BOILER_MIN_DF distinct documents are 'boilerplate'; per document,
    report how much of its (distinct) shingle set is boilerplate. The
    inverted index is the shared doc_shingle_set (8-byte hashed keys); the
    hot set is document-frequency-bounded (|corpus| / min_df), so the
    back-join is candidate-linear — the same df-cap idea that bounds
    ngram_jaccard_pairs."""
    d = load(spark, sf_dir, "documents")
    # persisted: the explode+hash subtree feeds three consumers (df count,
    # per-doc totals, back-join) — same shared-subtree pattern as the
    # minhash/jaccard dedup queries; lifetime is the session's (queries
    # return lazy plans, so the cache must outlive this function)
    ds = doc_shingle_set(d).persist()
    hot = (
        ds.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= _BOILER_MIN_DF)
        .select("shingle")
    )
    tot = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    boil = ds.join(hot, "shingle").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_boiler"))
    return (
        tot.join(boil, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            F.round(F.coalesce("n_boiler", F.lit(0)) / F.col("n_shingles"), 6).alias(
                "boiler_frac"
            ),
        )
        .orderBy("doc_id")
    )
