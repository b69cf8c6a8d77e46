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
from incubator_flink_spark.functions.hashing import hash64, hash64_sql
from incubator_flink_spark.functions.text import (
    PII_ORDER,
    PII_PATTERNS,
    redact_pii,
    shingles,
    shingles_sql,
    tokens,
    tokens_sql,
)
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


# --- benchmark decontamination ----------------------------------------------
# Standard eval-set decontamination (public recipes: GPT-3 appendix C /
# The Pile / FineWeb): flag training documents that share word n-grams
# with a held-out benchmark set.  The benchmark here is the deterministic
# doc_id % 97 == 0 slice (stands in for an external eval corpus).  Scale
# shape: a real benchmark shingle set is tiny relative to the corpus
# (thousands of eval docs vs billions of training docs), so the engine
# broadcasts it and the contamination scan is a map-side semi-join over
# the inverted index — no corpus-vs-corpus shuffle.

_BENCH_MOD = 97

DECONTAMINATE_ORACLE = f"""
WITH ds AS ({_DS_CTE}),
bench AS (SELECT DISTINCT shingle FROM ds WHERE doc_id % {_BENCH_MOD} = 0),
train AS (SELECT * FROM ds WHERE doc_id % {_BENCH_MOD} <> 0),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM train GROUP BY doc_id),
hit AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
        FROM train t JOIN bench USING (shingle) GROUP BY t.doc_id)
SELECT hit.doc_id, n_shingles, n_contaminated,
       ROUND(1.0 * n_contaminated / n_shingles, 6) AS contam_frac
FROM hit JOIN tot USING (doc_id)
ORDER BY doc_id
"""


@register("decontaminate_ngram", DECONTAMINATE_ORACLE)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing >=1 word 3-shingle with the benchmark slice
    (doc_id % 97 == 0): per contaminated doc, its distinct-shingle count,
    how many of those shingles appear in the benchmark, and the fraction.
    The benchmark shingle set is explicitly broadcast."""
    d = load(spark, sf_dir, "documents")
    ds = doc_shingle_set(d).persist()  # feeds bench + train twice
    bench = (
        ds.where(F.col("doc_id") % _BENCH_MOD == 0).select("shingle").distinct()
    )
    train = ds.where(F.col("doc_id") % _BENCH_MOD != 0)
    tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hit = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        hit.join(tot, "doc_id")
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias("contam_frac"),
        )
        .orderBy("doc_id")
    )


# --- TF-IDF keyword extraction ----------------------------------------------

_TFIDF_K = 3

TFIDF_ORACLE = f"""
WITH w AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * LN(n.n / df.df), 6) AS score
  FROM tf JOIN df USING (term), n),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
  FROM scored)
SELECT doc_id, term, tf, score, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {_TFIDF_K}
ORDER BY doc_id, rnk
"""


@register("tfidf_topk", TFIDF_ORACLE)
def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} terms per document by tf-idf (tf * ln(N/df); ties broken by
    term).  Linear pipeline: explode -> (doc,term) agg -> vocabulary df
    agg -> join back on term -> per-doc top-k window.  All shuffles are
    keyed on (doc_id, term), term, or doc_id — no pairwise blowup; the
    1-row corpus count joins in as a broadcast."""
    from pyspark.sql import Window

    d = spread(load(spark, sf_dir, "documents"))
    # Pin the term-frequency table: it feeds the vocabulary aggregate AND
    # the scored join, and without the pin each consumer re-executed the
    # tokenize+explode+aggregate subtree (guide §5 persist-when-reused).
    # tf is (doc, term)-proportional, far smaller than the corpus text.
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_tbl = d.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    scored = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6).alias("score"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= _TFIDF_K)
        .select("doc_id", "term", "tf", "score", F.col("rnk").cast("int").alias("rnk"))
        .orderBy("doc_id", "rnk")
    )


# --- BM25 retrieval (benchmark-query search over the corpus) ------------------
# Okapi BM25 (Robertson/Sparck Jones; the standard retrieval scorer) —
# the curation uses: scoring training docs against benchmark queries for
# decontamination-by-relevance, and building keyword indexes over a
# corpus.  Same linear shuffle discipline as tfidf_topk: explode ->
# (doc, term) agg -> vocabulary df agg -> broadcast the (tiny) query-term
# set and the 1-row corpus stats -> per-term top-k window.  The query
# terms here are the corpus's highest-df terms of length >= 4 (a
# deterministic, data-derived stand-in for an external query file).

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_NQ = 8
_BM25_K = 5

BM25_ORACLE = f"""
WITH w AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, CAST(SUM(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
         (SELECT CAST(SUM(tf) AS DOUBLE) FROM tf) /
         CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl),
qterms AS (
  SELECT term, df FROM df WHERE length(term) >= 4
  ORDER BY df DESC, term LIMIT {_BM25_NQ}),
scored AS (
  SELECT q.term, tf.doc_id, tf.tf,
         ROUND(LN((s.n - q.df + 0.5) / (q.df + 0.5) + 1)
               * tf.tf * ({_BM25_K1} + 1)
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl)),
               6) AS score
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id, stats s),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rnk
  FROM scored)
SELECT term, doc_id, tf, score, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {_BM25_K}
ORDER BY term, rnk
"""


@register("bm25_topk", BM25_ORACLE)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} documents per query term by Okapi BM25 (k1=1.2, b=0.75,
    the +1 idf form that keeps scores positive at high df).  All shuffles
    keyed on (doc, term), term, or doc; the query-term set and the 1-row
    corpus stats broadcast; the ranking window runs over the
    candidate-sized scored set, never the corpus."""
    from pyspark.sql import Window

    d = spread(load(spark, sf_dir, "documents"))
    # Pin the term-frequency table: FOUR consumers (vocabulary df, doc
    # lengths, corpus total, scored join) re-executed the tokenize+
    # explode+aggregate subtree without it (guide §5 persist-when-reused).
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    tot_tf = tf.agg(F.sum("tf").cast("double").alias("__t"))
    stats = n_docs.crossJoin(tot_tf).select(
        "__n", (F.col("__t") / F.col("__n")).alias("__avgdl")
    )
    qterms = (
        df_tbl.where(F.length("term") >= 4)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(_BM25_NQ)
    )
    idf = F.log((F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    tfn = (
        F.col("tf")
        * (_BM25_K1 + 1)
        / (F.col("tf") + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("__avgdl")))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("term", "doc_id", "tf", F.round(idf * tfn, 6).alias("score"))
    )
    win = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= _BM25_K)
        .select("term", "doc_id", "tf", "score", F.col("rnk").cast("int").alias("rnk"))
        .orderBy("term", "rnk")
    )


# --- deterministic mixture resampling ----------------------------------------
# Down-weighting over-represented sources/languages is the standard
# mixture-rebalancing pass in training-data pipelines.  The keep decision
# is a deterministic hash Bernoulli (hash64 of a salted doc key mod 10k),
# so it is reproducible, revisit-safe, and embarrassingly parallel —
# map-only, zero shuffles at any scale.

_MIX_RATES = {"en": 0.5, "zh": 0.8}  # others keep everything
_MIX_DEN = 10_000

_RATE_CASE = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {int(rate * _MIX_DEN)}" for lang, rate in _MIX_RATES.items()
) + f" ELSE {_MIX_DEN} END"

MIXTURE_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang,
         {hash64_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % {_MIX_DEN} AS bucket
  FROM documents)
SELECT doc_id, lang, bucket
FROM b WHERE bucket < {_RATE_CASE}
ORDER BY doc_id
"""


@register("mixture_sample", MIXTURE_ORACLE)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling: keep a doc iff
    hash64('mix:'||doc_id) mod 10000 falls under its language's rate
    (en 0.5, zh 0.8, rest 1.0)."""
    d = load(spark, sf_dir, "documents")
    bucket = hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % _MIX_DEN
    rate = F.lit(_MIX_DEN)
    for lang, r in _MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(int(r * _MIX_DEN))).otherwise(rate)
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
        .orderBy("doc_id")
    )


# --- exact-quota stratified sampling -----------------------------------------
# The Bernoulli pass above hits rates in expectation; dataset contracts
# ("exactly N docs per language") need EXACT quotas.  Deterministic
# version: rank each stratum by the seeded hash (a reproducible random
# order) and keep the first N — one shuffle on (lang), rank within
# stratum, no driver involvement.  At 100 TB the per-stratum rank is a
# window over the stratum's partition; heavily-skewed strata fall back
# to the two-phase (sample-bound + filter) pattern, documented here.

_QUOTA = {"en": 120, "zh": 80}
_QUOTA_DEFAULT = 50

_QUOTA_CASE = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {q}" for lang, q in _QUOTA.items()
) + f" ELSE {_QUOTA_DEFAULT} END"

QUOTA_SAMPLE_ORACLE = f"""
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {hash64_sql("'quota:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
  FROM documents)
SELECT doc_id, lang, CAST(rn AS INT) AS rn
FROM r WHERE rn <= {_QUOTA_CASE}
ORDER BY doc_id
"""


@register("mixture_quota_sample", QUOTA_SAMPLE_ORACLE)
def mixture_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quotas (en 120, zh 80, default 50): rank each
    stratum by seeded hash — a reproducible random order — and keep the
    first N. Deterministic, one shuffle, no driver round-trip."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    key = hash64(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy(key, "doc_id")
    quota = F.lit(_QUOTA_DEFAULT)
    for lang, q in _QUOTA.items():
        quota = F.when(F.col("lang") == lang, F.lit(q)).otherwise(quota)
    return (
        d.select("doc_id", "lang", F.row_number().over(w).cast("int").alias("rn"), quota.alias("__q"))
        .where(F.col("rn") <= F.col("__q"))
        .drop("__q")
        .orderBy("doc_id")
    )


# --- PII scrubbing ------------------------------------------------------------
# functions/text.redact_pii is the engine primitive (pure Catalyst
# regexp_count/regexp_replace, map-only at any scale); this query plants
# deterministic synthetic PII (the corpus itself is clean word-soup) so
# the oracle actually exercises the redaction + counting paths in both
# engines.

_PII_AUG_SPARK = None  # built lazily below


def _augment_pii(text, doc_id):
    """Deterministic synthetic-PII augmentation, Spark side."""
    email_tail = F.concat(
        F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com from 10.0.0."),
        (doc_id % 250 + 1).cast("string"),
    )
    phone_tail = F.lit(" call 555-867-5309 ssn 123-45-6789")
    out = F.when(doc_id % 7 == 0, F.concat(text, email_tail)).otherwise(text)
    return F.when(doc_id % 11 == 0, F.concat(out, phone_tail)).otherwise(out)


_PII_AUG_SQL = (
    "CASE WHEN doc_id % 11 = 0 THEN "
    "  (CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)"
    "        || '@example.com from 10.0.0.' || CAST(doc_id % 250 + 1 AS VARCHAR) ELSE text END)"
    "  || ' call 555-867-5309 ssn 123-45-6789' "
    "WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)"
    "  || '@example.com from 10.0.0.' || CAST(doc_id % 250 + 1 AS VARCHAR) "
    "ELSE text END"
)


def _pii_oracle() -> str:
    red = "aug"
    for name in PII_ORDER:
        pat, repl = PII_PATTERNS[name]
        pat_sql = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{pat_sql}', '{repl}', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(aug, '{PII_PATTERNS[n][0]}')) AS INTEGER) AS n_{n}"
        for n in PII_ORDER
    )
    return f"""
WITH a AS (SELECT doc_id, {_PII_AUG_SQL} AS aug FROM documents)
SELECT doc_id, {red} AS redacted, {counts}
FROM a ORDER BY doc_id
"""


@register("pii_scrub", _pii_oracle())
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide PII redaction pass: plant deterministic synthetic
    emails/IPs/phones/SSNs, then scrub with functions/text.redact_pii and
    report per-doc match counts alongside the redacted text."""
    d = load(spark, sf_dir, "documents")
    aug = _augment_pii(F.col("text"), F.col("doc_id"))
    return (
        d.select("doc_id", redact_pii(aug).alias("p"))
        .select("doc_id", "p.redacted", *[f"p.n_{n}" for n in PII_ORDER])
        .orderBy("doc_id")
    )


# ---- deterministic shuffle + shard export (operators/export.py) --------

_SHARD_SEED = 42
_NUM_SHARDS = 8

EXPORT_SHARD_PLAN_ORACLE = f"""
WITH k AS (
  SELECT doc_id,
         {hash64_sql("'42:' || CAST(doc_id AS VARCHAR)")} AS skey
  FROM documents),
s AS (
  SELECT doc_id, skey, CAST(skey % {_NUM_SHARDS} AS INT) AS shard,
         ROW_NUMBER() OVER (PARTITION BY CAST(skey % {_NUM_SHARDS} AS INT)
                            ORDER BY skey, doc_id) AS rn
  FROM k)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS docs,
       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS first_doc
FROM s GROUP BY shard
ORDER BY shard
"""


@register("export_shard_plan", EXPORT_SHARD_PLAN_ORACLE)
def export_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard assignment + deterministic training order of the shard
    export path (operators/export.py): per-shard doc counts and the first
    document in seeded-shuffle order. The 60-bit seeded hash is the same
    oracle-replicated key export_shards writes with, so a hash match
    proves both the assignment and the within-shard ordering."""
    from pyspark.sql import Window as W

    from incubator_flink_spark.operators.export import shard_id, shuffle_key

    d = load(spark, sf_dir, "documents")
    key = shuffle_key("doc_id", _SHARD_SEED)
    sel = d.select(
        "doc_id", key.alias("skey"), shard_id("doc_id", _NUM_SHARDS, _SHARD_SEED).alias("shard")
    )
    w = W.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        sel.withColumn("rn", F.row_number().over(w))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("first_doc"),
        )
        .orderBy("shard")
    )


# --- sequence packing (training-data layout) ---------------------------------
# Concat-and-split sample packing: documents in a deterministic shuffled
# order, the per-shard token stream cut into fixed-capacity bins
# (operators/packing.py documents the one-shuffle + per-shard-prefix-sum
# scale shape; the hash order doubles as the pre-training shuffle).

_PACK_CAP = 512
_PACK_SHARDS = 16
_PACK_H = hash64_sql("'pack:' || CAST(doc_id AS VARCHAR)")

_PACK_PLAN_CTE = f"""
base AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         {_PACK_H} AS h,
         CAST({_PACK_H} % {_PACK_SHARDS} AS INT) AS shard
  FROM documents),
plan AS (
  SELECT doc_id, n_tokens, shard,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS BIGINT) AS pos,
         CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id) - n_tokens)
              // {_PACK_CAP} AS BIGINT) AS bin,
         CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id) - n_tokens)
              % {_PACK_CAP} AS BIGINT) AS bin_offset
  FROM base)
"""

SEQUENCE_PACKING_ORACLE = f"""
WITH {_PACK_PLAN_CTE}
SELECT doc_id, n_tokens, shard, pos, bin, bin_offset
FROM plan ORDER BY doc_id
"""


@register("sequence_packing", SEQUENCE_PACKING_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document packing plan: where each document's first token lands
    in its shard's fixed-capacity (512-token) training stream."""
    from incubator_flink_spark.operators.packing import pack_sequences

    d = load(spark, sf_dir, "documents")
    return pack_sequences(d, _PACK_CAP, _PACK_SHARDS).orderBy("doc_id")


PACKING_STATS_ORACLE = f"""
WITH {_PACK_PLAN_CTE}
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(CEIL(SUM(n_tokens) * 1.0 / {_PACK_CAP}) AS BIGINT) AS n_bins,
       ROUND(SUM(n_tokens) * 1.0 / (CAST(CEIL(SUM(n_tokens) * 1.0 / {_PACK_CAP}) AS BIGINT) * {_PACK_CAP}), 6) AS fill_frac
FROM plan GROUP BY shard ORDER BY shard
"""


@register("packing_stats", PACKING_STATS_ORACLE)
def packing_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packing summary (bin count and average fill)."""
    from incubator_flink_spark.operators.packing import packing_stats

    d = load(spark, sf_dir, "documents")
    return packing_stats(d, _PACK_CAP, _PACK_SHARDS).orderBy("shard")


# --- column profiling (pipeline data-quality monitoring) ----------------------
# ANALYZE-style per-column stats in ONE aggregation pass (map-side
# partials, single output row, no low-cardinality shuffle key) unpivoted
# to long form — operators/profile.py.

_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")

TABLE_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM documents"""
    for c in _PROFILE_COLS
) + "\nORDER BY col_name"


@register("table_profile", TABLE_PROFILE_ORACLE)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact column profile of the documents table."""
    from incubator_flink_spark.operators.profile import profile_table

    d = load(spark, sf_dir, "documents")
    return profile_table(d, list(_PROFILE_COLS)).orderBy("col_name")


# --- document chunking with overlap (RAG / context-window prep) ---------------

_CHUNK_N = 32
_CHUNK_O = 8
_CHUNK_S = _CHUNK_N - _CHUNK_O

DOC_CHUNKING_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
nc AS (
  SELECT doc_id, t,
         CASE WHEN len(t) <= {_CHUNK_N} THEN 1
              ELSE CAST(CEIL((len(t) - {_CHUNK_N}) * 1.0 / {_CHUNK_S}) AS INT) + 1 END AS n_chunks
  FROM toks WHERE len(t) >= 1)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       CAST(len(t[i*{_CHUNK_S}+1 : i*{_CHUNK_S}+{_CHUNK_N}]) AS BIGINT) AS n_tokens,
       array_to_string(t[i*{_CHUNK_S}+1 : i*{_CHUNK_S}+{_CHUNK_N}], ' ') AS chunk_text
FROM nc, unnest(generate_series(0, n_chunks - 1)) AS u(i)
ORDER BY doc_id, chunk_id
"""


@register("doc_chunking", DOC_CHUNKING_ORACLE)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size (32-token) chunks with 8-token overlap per document —
    map-only (no shuffle at any scale); operators/spans.chunk_documents."""
    from incubator_flink_spark.operators.spans import chunk_documents

    d = load(spark, sf_dir, "documents")
    return chunk_documents(d, _CHUNK_N, _CHUNK_O).orderBy("doc_id", "chunk_id")


# --- LM-perplexity quality filter (CCNet-style) -------------------------------
# Count-based bigram self-perplexity (operators/lm.py): every corpus
# bigram is in the model, so the scoring join is total; a held-out
# scorer would left-join with the unseen-mass fallback.

_BIGRAMS = shingles_sql(_TOKS, 2)

LM_PERPLEXITY_ORACLE = f"""
WITH bi AS (SELECT doc_id, unnest({_BIGRAMS}) AS bg FROM documents),
pair AS (
  SELECT doc_id, string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
  FROM bi),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pair GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM pair GROUP BY 1),
v AS (SELECT COUNT(DISTINCT w) AS v FROM (SELECT unnest({_TOKS}) AS w FROM documents) t),
model AS (
  SELECT c12.w1, c12.w2,
         (c12 + CAST(1 AS DOUBLE)/2) / (c1 + CAST(1 AS DOUBLE)/2 * v.v) AS prob
  FROM c12 JOIN c1 USING (w1), v),
sc AS (
  SELECT p.doc_id, CAST(ln(m.prob) AS DECIMAL(30,12)) AS l
  FROM pair p JOIN model m ON m.w1 = p.w1 AND m.w2 = p.w2)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(-CAST(CAST(SUM(l) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS nll
FROM sc GROUP BY doc_id ORDER BY doc_id
"""


@register("lm_perplexity", LM_PERPLEXITY_ORACLE)
def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    add-0.5-smoothed bigram model — the CCNet-style perplexity quality
    signal, fully in Catalyst."""
    from incubator_flink_spark.operators.lm import doc_nll

    d = load(spark, sf_dir, "documents")
    return doc_nll(d).orderBy("doc_id")


# --- chunk -> pack integration (the actual pre-training layout pass) ----------
# chunk_documents feeds pack_sequences directly: chunking is map-only, so
# the composed pipeline still costs exactly one shuffle (the packing
# shard key feeding the per-shard prefix-sum window) — the chunk stage
# fuses into the packing exchange with no extra stage boundary
# (plan-pinned in tests/test_plans.py).

_CP_H = hash64_sql("'pack:' || chunk_key")

CHUNK_PACK_PLAN_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
nc AS (
  SELECT doc_id, t,
         CASE WHEN len(t) <= {_CHUNK_N} THEN 1
              ELSE CAST(CEIL((len(t) - {_CHUNK_N}) * 1.0 / {_CHUNK_S}) AS INT) + 1 END AS n_chunks
  FROM toks WHERE len(t) >= 1),
chunks AS (
  SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR) AS chunk_key,
         array_to_string(t[i*{_CHUNK_S}+1 : i*{_CHUNK_S}+{_CHUNK_N}], ' ') AS chunk_text
  FROM nc, unnest(generate_series(0, n_chunks - 1)) AS u(i)),
base AS (
  SELECT chunk_key,
         CAST(len(regexp_extract_all(lower(chunk_text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         {_CP_H} AS h,
         CAST({_CP_H} % {_PACK_SHARDS} AS INT) AS shard
  FROM chunks),
plan AS (
  SELECT chunk_key, n_tokens, shard,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, chunk_key) - 1 AS BIGINT) AS pos,
         CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, chunk_key) - n_tokens)
              // {_PACK_CAP} AS BIGINT) AS bin,
         CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, chunk_key) - n_tokens)
              % {_PACK_CAP} AS BIGINT) AS bin_offset
  FROM base)
SELECT chunk_key, n_tokens, shard, pos, bin, bin_offset
FROM plan ORDER BY chunk_key
"""


@register("chunk_pack_plan", CHUNK_PACK_PLAN_ORACLE)
def chunk_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document (32-token windows, 8 overlap), then pack the
    CHUNKS into fixed-capacity training bins — the composed
    pre-training layout pass.  Chunk ids are deterministic
    doc_id:chunk_id strings, so the packing hash order (and therefore
    the whole layout) is reproducible run to run."""
    from incubator_flink_spark.operators.packing import pack_sequences
    from incubator_flink_spark.operators.spans import chunk_documents

    d = load(spark, sf_dir, "documents")
    chunks = chunk_documents(d, _CHUNK_N, _CHUNK_O).select(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.col("chunk_id").cast("string")
        ).alias("chunk_key"),
        "chunk_text",
    )
    return pack_sequences(
        chunks, _PACK_CAP, _PACK_SHARDS, id_col="chunk_key", text_col="chunk_text"
    ).orderBy("chunk_key")


# --- trained linear-probe quality classifier ----------------------------------
# operators/classifier.py: hashed bag-of-words features, full-batch GD,
# squared loss (no libm anywhere) — the oracle unrolls the identical
# training steps and must reproduce every weight and score bit-for-bit,
# the same contract as the IVF/PQ k-means trainings.

_LP_B = 16
_LP_T = 3
_LP_LR = 0.5


def _linear_probe_oracle(n_buckets: int = _LP_B, iters: int = _LP_T, lr: float = _LP_LR) -> str:
    parts = [
        f"""WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
ntok AS (SELECT doc_id, len(t) AS n FROM base),
cnt AS (
  SELECT doc_id, CAST({hash64_sql("w")} % {n_buckets} AS INT) AS j, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(t) AS w FROM base) u GROUP BY 1, 2),
feats AS MATERIALIZED (
  SELECT cnt.doc_id, cnt.j, CAST(cnt.c AS DOUBLE) / n.n AS x
  FROM cnt JOIN ntok n ON n.doc_id = cnt.doc_id
  UNION ALL
  SELECT doc_id, {n_buckets} AS j, CAST(1.0 AS DOUBLE) AS x FROM ntok),
y AS (SELECT doc_id, CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y FROM documents),
nn AS (SELECT COUNT(*) AS n FROM documents),
w0 AS (SELECT CAST(j AS INT) AS j, CAST(0 AS DOUBLE) AS w FROM range({n_buckets + 1}) t(j))"""
    ]
    for t in range(iters):
        parts.append(
            f""",
p{t} AS (
  SELECT f.doc_id, CAST(CAST(SUM(CAST(f.x * w.w AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS pred
  FROM feats f JOIN w{t} w ON w.j = f.j GROUP BY 1),
e{t} AS (
  SELECT p.doc_id, p.pred - y.y AS e FROM p{t} p JOIN y ON y.doc_id = p.doc_id),
g{t} AS (
  SELECT f.j, CAST(CAST(SUM(CAST(e.e * f.x AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS g
  FROM feats f JOIN e{t} e ON e.doc_id = f.doc_id GROUP BY 1),
w{t + 1} AS MATERIALIZED (
  SELECT w.j, w.w - {lr} * (COALESCE(g.g, CAST(0 AS DOUBLE)) / nn.n) AS w
  FROM w{t} w LEFT JOIN g{t} g ON g.j = w.j, nn)"""
        )
    parts.append(
        f"""
SELECT f.doc_id, y.y,
       ROUND(CAST(CAST(SUM(CAST(f.x * w.w AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE), 6) AS score
FROM feats f JOIN w{iters} w ON w.j = f.j JOIN y ON y.doc_id = f.doc_id
GROUP BY f.doc_id, y.y
ORDER BY f.doc_id"""
    )
    return "".join(parts)


@register("quality_linear_probe", _linear_probe_oracle())
def quality_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a linear probe predicting lang == 'en' from hashed
    bag-of-words features (3 full-batch GD steps), then score every
    document — the trained-classifier quality-filter pass.  Oracle
    unrolls the identical training; weights and scores must match
    bit-for-bit."""
    from incubator_flink_spark.operators.classifier import (
        score_linear_probe,
        train_linear_probe,
    )

    d = load(spark, sf_dir, "documents")
    label = F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0))
    w = train_linear_probe(d, label, n_buckets=_LP_B, iters=_LP_T, lr=_LP_LR)
    y = d.select("doc_id", label.cast("double").alias("y"))
    return (
        score_linear_probe(d, w, n_buckets=_LP_B)
        .join(y, "doc_id")
        .select("doc_id", "y", "score")
        .orderBy("doc_id")
    )


# --- deterministic train/val/test split --------------------------------------
# The layout pass every training run starts with: assign each document
# to a split by seeded hash so the assignment is (a) reproducible across
# runs and engines, (b) stable under corpus growth (a doc's split never
# depends on other docs), and (c) stratified for free — hash buckets are
# uniform within every language slice.  Map-only: no shuffle at ALL for
# the assignment itself (the registered query adds one tiny summary agg
# to prove per-language balance alongside the per-doc assignment).

_SPLIT_DEN = 100
_SPLIT_TRAIN = 90  # [0, 90) train
_SPLIT_VAL = 95    # [90, 95) val, [95, 100) test

_SPLIT_CASE = (
    f"CASE WHEN b < {_SPLIT_TRAIN} THEN 'train' "
    f"WHEN b < {_SPLIT_VAL} THEN 'val' ELSE 'test' END"
)

STRATIFIED_SPLIT_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang,
         {hash64_sql("'split:' || CAST(doc_id AS VARCHAR)")} % {_SPLIT_DEN} AS b
  FROM documents)
SELECT doc_id, lang, {_SPLIT_CASE} AS split
FROM b
ORDER BY doc_id
"""


@register("stratified_split", STRATIFIED_SPLIT_ORACLE)
def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by seeded hash —
    map-only, growth-stable, uniform within every language stratum."""
    from incubator_flink_spark.operators.export import assign_split

    d = load(spark, sf_dir, "documents")
    return assign_split(
        d, "doc_id", train=_SPLIT_TRAIN, val=_SPLIT_VAL, den=_SPLIT_DEN
    ).select("doc_id", "lang", "split").orderBy("doc_id")


SPLIT_BALANCE_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang,
         {hash64_sql("'split:' || CAST(doc_id AS VARCHAR)")} % {_SPLIT_DEN} AS b
  FROM documents),
s AS (SELECT lang, {_SPLIT_CASE} AS split FROM b)
SELECT lang, split, COUNT(*) AS n_docs,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS frac
FROM s GROUP BY lang, split
ORDER BY lang, split
"""


@register("split_balance", SPLIT_BALANCE_ORACLE)
def split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratification audit for ``stratified_split``: per (lang, split)
    counts and within-language fractions — the check that hash splitting
    really is uniform inside every stratum.  One aggregate over the
    map-only assignment; the window runs over the (lang x 3) rollup."""
    from pyspark.sql import Window as W

    from incubator_flink_spark.operators.export import assign_split

    d = load(spark, sf_dir, "documents")
    s = assign_split(d, "doc_id", train=_SPLIT_TRAIN, val=_SPLIT_VAL, den=_SPLIT_DEN)
    per = s.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n_docs"))
    return per.select(
        "lang",
        "split",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(W.partitionBy("lang")),
            6,
        ).alias("frac"),
    ).orderBy("lang", "split")


# --- length-percentile filtering ---------------------------------------------
# Per-language exact p10/p90 bounds on document length, then keep only
# in-band documents — the standard "drop truncated fragments and
# runaway concatenations" pass.  The percentile runs per language as an
# aggregate (Spark `percentile`, DuckDB `quantile_cont` — the identical
# (n-1)*p linear interpolation on doubles, so the bounds agree
# bit-for-bit on integer inputs), broadcast back onto the corpus.

LENGTH_BAND_FILTER_ORACLE = """
WITH bounds AS (
  SELECT lang,
         quantile_cont(n_chars, 0.10) AS lo,
         quantile_cont(n_chars, 0.90) AS hi
  FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars,
       ROUND(b.lo, 6) AS lo, ROUND(b.hi, 6) AS hi
FROM documents d JOIN bounds b ON d.lang = b.lang
WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
ORDER BY d.doc_id
"""


@register("length_band_filter", LENGTH_BAND_FILTER_ORACLE)
def length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents inside their language's exact [p10, p90] length
    band.  One per-language percentile aggregate (a few rows) broadcast
    back onto the corpus — the fact is scanned once and never shuffled."""
    d = load(spark, sf_dir, "documents")
    bounds = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.10)).alias("lo"),
        F.percentile("n_chars", F.lit(0.90)).alias("hi"),
    )
    return (
        d.join(F.broadcast(bounds), "lang")
        .where((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round("lo", 6).alias("lo"),
            F.round("hi", 6).alias("hi"),
        )
        .orderBy("doc_id")
    )


# --- token-length histogram ---------------------------------------------------
# The corpus-shape profile every data card reports: per (lang,
# log2-bucket of token count) document counts.  floor(log2(n)) is exact
# in IEEE doubles at powers of two and has huge margin elsewhere, so
# both engines bucket identically.

TOKEN_HISTOGRAM_ORACLE = f"""
WITH n AS (SELECT lang, len({_TOKS}) AS n_tokens FROM documents)
SELECT lang, CAST(FLOOR(LOG2(n_tokens)) AS BIGINT) AS bucket,
       CAST(POW(2, CAST(FLOOR(LOG2(n_tokens)) AS BIGINT)) AS BIGINT) AS bucket_lo,
       COUNT(*) AS n_docs,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM n WHERE n_tokens > 0
GROUP BY lang, bucket
ORDER BY lang, bucket
"""


@register("token_histogram", TOKEN_HISTOGRAM_ORACLE)
def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language log2 histogram of document token counts — one
    map-side tokenize + one (lang, bucket) aggregate."""
    d = load(spark, sf_dir, "documents")
    n = d.select("lang", F.size(tokens(F.col("text"))).alias("n_tokens")).where(
        F.col("n_tokens") > 0
    )
    bucket = F.floor(F.log2("n_tokens")).cast("bigint")
    return (
        n.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
        .select(
            "lang",
            "bucket",
            F.pow(F.lit(2), F.col("bucket")).cast("bigint").alias("bucket_lo"),
            "n_docs",
            "min_tokens",
            "max_tokens",
        )
        .orderBy("lang", "bucket")
    )


# --- CCNet perplexity bucketing (head/middle/tail layout) ---------------------
# The composition CCNet actually ships: per-language thirds of the
# perplexity distribution decide which bucket a document lands in
# (head = lowest-nll third).  Tertiles are RANK-based (NTILE over a
# total order with doc_id tiebreak on 6-decimal-rounded nll), never
# interpolated percentiles, so both engines bucket identically.

PERPLEXITY_BUCKETS_ORACLE = f"""
WITH bi AS (SELECT doc_id, unnest({_BIGRAMS}) AS bg FROM documents),
pair AS (
  SELECT doc_id, string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
  FROM bi),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pair GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM pair GROUP BY 1),
v AS (SELECT COUNT(DISTINCT w) AS v FROM (SELECT unnest({_TOKS}) AS w FROM documents) t),
model AS (
  SELECT c12.w1, c12.w2,
         (c12 + CAST(1 AS DOUBLE)/2) / (c1 + CAST(1 AS DOUBLE)/2 * v.v) AS prob
  FROM c12 JOIN c1 USING (w1), v),
sc AS (
  SELECT p.doc_id, CAST(ln(m.prob) AS DECIMAL(30,12)) AS l
  FROM pair p JOIN model m ON m.w1 = p.w1 AND m.w2 = p.w2),
nll AS (
  SELECT doc_id, ROUND(-CAST(CAST(SUM(l) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS nll
  FROM sc GROUP BY doc_id),
wl AS (
  SELECT n.doc_id, d.lang, n.nll FROM nll n JOIN documents d USING (doc_id)),
b AS (
  SELECT lang, nll,
         CAST(NTILE(3) OVER (PARTITION BY lang ORDER BY nll, doc_id) AS BIGINT) AS bucket
  FROM wl)
SELECT lang, bucket, COUNT(*) AS n_docs,
       ROUND(MIN(nll), 6) AS min_nll, ROUND(MAX(nll), 6) AS max_nll
FROM b GROUP BY lang, bucket ORDER BY lang, bucket
"""


@register("perplexity_buckets", PERPLEXITY_BUCKETS_ORACLE)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus layout: per-language NTILE(3)
    over document perplexity.  Composes the vocabulary-bounded bigram
    model with a grouped ``ntile_exact`` (operators/rank.py) over the
    DOC-sized nll table — language is a skewed key on a real web corpus
    (English is most of it), so the cut uses a range partition on
    (lang, nll) at full parallelism rather than one window partition
    per language, then a dim-sized aggregate."""
    from incubator_flink_spark.operators.lm import doc_nll
    from incubator_flink_spark.operators.rank import ntile_exact

    d = load(spark, sf_dir, "documents")
    nll = doc_nll(d).select("doc_id", "nll")
    wl = nll.join(d.select("doc_id", "lang"), "doc_id")
    b = ntile_exact(wl, ["nll", "doc_id"], 3, "bucket", partition_cols=["lang"]).select(
        "lang", "nll", "bucket"
    )
    return (
        b.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("nll"), 6).alias("min_nll"),
            F.round(F.max("nll"), 6).alias("max_nll"),
        )
        .orderBy("lang", "bucket")
    )


# --- temperature-scaled mixture sampling --------------------------------------
# The multilingual-standard reweighting (public: multilingual BERT /
# XLM-R docs, DoReMi discussion): per-language budget proportional to
# n_l^alpha with alpha = 0.5, flattening the head so low-resource
# languages keep representation.  Determinism: sqrt(n) is quantized to
# DECIMAL(30,9) before the (exact) total sum; the share division and
# the floor(N * share) quota are then single deterministic IEEE ops on
# identical inputs in both engines; selection reuses the seeded-hash
# stratum rank of mixture_quota_sample.

_TEMP_N = 300

TEMP_SAMPLE_ORACLE = f"""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
s AS (SELECT lang, n, CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(30,9)) AS sl FROM c),
t AS (SELECT CAST(SUM(sl) AS DECIMAL(30,9)) AS st FROM s),
q AS (
  SELECT lang, CAST(FLOOR({_TEMP_N} * (CAST(sl AS DOUBLE) / CAST(st AS DOUBLE))) AS INT) AS quota
  FROM s, t),
r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {hash64_sql("'temp:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
  FROM documents)
SELECT r.doc_id, r.lang, CAST(r.rn AS INT) AS rn, q.quota
FROM r JOIN q ON r.lang = q.lang WHERE r.rn <= q.quota
ORDER BY r.doc_id
"""


@register("mixture_temperature_sample", TEMP_SAMPLE_ORACLE)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) language mixture: quotas are
    n_l^0.5-proportional shares of a 300-doc budget, selection is the
    seeded-hash stratum rank.  One stratum shuffle; the quota table is
    |langs| rows and broadcast back."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    s = c.select("lang", F.sqrt(F.col("n").cast("double")).cast("decimal(30,9)").alias("sl"))
    t = s.agg(F.sum("sl").cast("decimal(30,9)").alias("st"))
    q = s.crossJoin(F.broadcast(t)).select(
        "lang",
        F.floor(
            F.lit(_TEMP_N) * (F.col("sl").cast("double") / F.col("st").cast("double"))
        )
        .cast("int")
        .alias("quota"),
    )
    key = hash64(F.concat(F.lit("temp:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy(key, "doc_id")
    r = d.select("doc_id", "lang", F.row_number().over(w).cast("int").alias("rn"))
    return (
        r.join(F.broadcast(q), "lang")
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang", "rn", "quota")
        .orderBy("doc_id")
    )


# --- per-source document caps (domain-cap resampling) -------------------------
# Capping documents per source/domain is the standard anti-domination pass
# (public practice: C4's per-domain limits, Gopher/RefinedWeb domain caps):
# no single crawl host may contribute more than N documents.  Selection is
# a seeded-hash rank WITHIN each source, computed by the grouped
# distributed-rank construction (operators/rank.py) — source is a skewed
# key on a real crawl (a few hosts dominate), so a per-source window
# would hot-spot exactly like the language NTILE did; the range partition
# on (source, hash) keeps every step at full parallelism.

_CAP_PER_SOURCE = 10

SOURCE_CAP_ORACLE = f"""
WITH h AS (
  SELECT doc_id, source,
         {hash64_sql("'cap:' || CAST(doc_id AS VARCHAR)")} AS hk
  FROM documents),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk
  FROM h)
SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {_CAP_PER_SOURCE}
ORDER BY source, rk
"""


@register("source_cap_sample", SOURCE_CAP_ORACLE)
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most {_CAP_PER_SOURCE} documents per source, selected by a
    seeded content-independent hash (reproducible, revisit-safe).  The
    within-source rank is the grouped distributed rank: range partition
    on (source, hash) + offset cumsum + broadcast group-start rebase —
    no per-source window partition anywhere in the plan."""
    from incubator_flink_spark.functions.hashing import hash64
    from incubator_flink_spark.operators.rank import distributed_rank

    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        hash64(F.concat(F.lit("cap:"), F.col("doc_id").cast("string"))).alias("hk"),
    )
    ranked = distributed_rank(keyed, ["source", "hk", "doc_id"], "grank")
    gstart = ranked.groupBy("source").agg(F.min("grank").alias("gs"))
    return (
        ranked.join(F.broadcast(gstart), "source")
        .withColumn("rk", F.col("grank") - F.col("gs") + 1)
        .where(F.col("rk") <= _CAP_PER_SOURCE)
        .select("source", "doc_id", "rk")
        .orderBy("source", "rk")
    )


# --- curation funnel report ---------------------------------------------------
# The per-language kept/dropped funnel every curation run publishes:
# exact dedup (normalized-content canonical) then quality filtering
# (the Gopher repetition thresholds above), with surviving token mass —
# ONE composed plan over the corpus, the integration shape of a real
# pipeline rather than per-operator queries.

from incubator_flink_spark.queries.documents import _NORM_SQL

CURATION_FUNNEL_ORACLE = f"""
WITH norm AS (
  SELECT doc_id, lang, text, md5({_NORM_SQL}) AS h FROM documents),
canon AS (SELECT h, MIN(doc_id) AS keeper FROM norm GROUP BY h),
flags AS (
  SELECT n.doc_id, n.lang, (n.doc_id = c.keeper) AS dup_keep
  FROM norm n JOIN canon c USING (h)),
w AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
wagg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         ROUND(1.0 * MAX(c) / SUM(c), 6) AS top_word_frac,
         ROUND(1.0 - 1.0 * COUNT(*) / SUM(c), 6) AS dup_word_frac
  FROM wc GROUP BY doc_id),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(a) - 1, 0)),
                               j -> a[j] || ' ' || a[j+1])) AS g
  FROM (SELECT doc_id, {_TOKS} AS a FROM documents) t),
gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g),
gagg AS (
  SELECT doc_id, ROUND(1.0 * MAX(c) / SUM(c), 6) AS top_bigram_frac
  FROM gc GROUP BY doc_id),
q AS (
  SELECT w.doc_id, w.n_words,
         (w.top_word_frac <= {_MAX_TOP_WORD}
          AND w.dup_word_frac <= {_MAX_DUP_WORD}
          AND COALESCE(g.top_bigram_frac, 0.0) <= {_MAX_TOP_BIGRAM}
          AND w.n_words >= {_MIN_WORDS}) AS q_keep
  FROM wagg w LEFT JOIN gagg g USING (doc_id))
SELECT f.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN NOT f.dup_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_dropped,
       CAST(SUM(CASE WHEN f.dup_keep AND NOT q.q_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_dropped,
       CAST(SUM(CASE WHEN f.dup_keep AND q.q_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN f.dup_keep AND q.q_keep THEN q.n_words ELSE 0 END) AS BIGINT) AS kept_tokens
FROM flags f JOIN q USING (doc_id)
GROUP BY f.lang ORDER BY f.lang
"""


@register("curation_funnel", CURATION_FUNNEL_ORACLE)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language curation funnel: exact-dedup drops (non-canonical
    normalized-content copies), then Gopher-quality drops among the
    survivors, survivor counts and their token mass.  One corpus scan
    feeds both the hash-keyed dedup aggregate and the (doc, gram)
    quality aggregates; the funnel itself is a dim-sized group-by."""
    from incubator_flink_spark.operators.dedup import normalize_text

    d = spread(load(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    norm = d.select("doc_id", "lang", F.md5(normalize_text(F.col("text"))).alias("h"))
    canon = norm.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    flags = norm.join(canon, "h").select(
        "doc_id", "lang", (F.col("doc_id") == F.col("keeper")).alias("dup_keep")
    )
    wc = (
        d.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wagg = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_word_frac"),
        F.round(F.lit(1.0) - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_word_frac"),
    )
    gc = (
        d.select("doc_id", F.explode(shingles(toks, 2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    gagg = gc.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )
    q = (
        wagg.join(gagg, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            (
                (F.col("top_word_frac") <= _MAX_TOP_WORD)
                & (F.col("dup_word_frac") <= _MAX_DUP_WORD)
                & (F.coalesce("top_bigram_frac", F.lit(0.0)) <= _MAX_TOP_BIGRAM)
                & (F.col("n_words") >= _MIN_WORDS)
            ).alias("q_keep"),
        )
    )
    j = flags.join(q, "doc_id")
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(~F.col("dup_keep"), 1).otherwise(0)).cast("bigint").alias("n_dup_dropped"),
            F.sum(F.when(F.col("dup_keep") & ~F.col("q_keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_quality_dropped"),
            F.sum(F.when(F.col("dup_keep") & F.col("q_keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("dup_keep") & F.col("q_keep"), F.col("n_words")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .orderBy("lang")
    )


# --- export integrity manifest -----------------------------------------------

EXPORT_MANIFEST_ORACLE = f"""
WITH k AS (
  SELECT doc_id, n_chars,
         {hash64_sql("'42:' || CAST(doc_id AS VARCHAR)")} AS skey,
         {hash64_sql("'m:' || CAST(doc_id AS VARCHAR) || ':' || text")} AS rowhash
  FROM documents)
SELECT CAST(skey % {_NUM_SHARDS} AS INT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       bit_xor(rowhash) AS content_checksum
FROM k GROUP BY 1 ORDER BY shard
"""


@register("export_manifest", EXPORT_MANIFEST_ORACLE)
def export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard export integrity manifest: doc count, byte volume, and
    an ORDER-INDEPENDENT content checksum (bit_xor of per-row 60-bit
    content hashes — a commutative-monoid fold, so it partial-aggregates
    map-side and is invariant to partitioning/task order, unlike any
    concatenation digest).  This is the reproducible-ingestion audit a
    100 TB export pipeline ships alongside its shards: re-run the
    manifest on the consumer side and compare checksums to prove the
    transfer byte-exact, shard by shard — without ever re-sorting the
    data.  Shard assignment matches export_shard_plan (same seeded
    hash), so the manifest certifies exactly what export_shards wrote."""
    d = load(spark, sf_dir, "documents")
    rowhash = hash64(
        F.concat(F.lit("m:"), F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
    )
    from incubator_flink_spark.operators.export import shard_id

    return (
        d.select(
            shard_id("doc_id", _NUM_SHARDS, _SHARD_SEED).alias("shard"),
            "n_chars",
            rowhash.alias("rowhash"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").cast("bigint").alias("total_bytes"),
            F.expr("bit_xor(rowhash)").alias("content_checksum"),
        )
        .orderBy("shard")
    )


# --- weighted sampling without replacement (Efraimidis-Spirakis) ---------------
# The quality/length-weighted corpus sampler: each doc draws a seeded
# uniform u and scores key = ln(u)/w (the log form of the E-S exponential
# key u^(1/w)); the global top-k by key IS a weighted sample without
# replacement.  Deterministic: u derives from hash64, the single ln per
# row is rounded to 9dp (kills cross-engine ulps; ties broken by doc_id),
# and selection is TakeOrdered top-k — map-only + k-row reduction, no
# full sort, no shuffle of the corpus at any scale.

_ES_K = 200
_ES_DEN = (1 << 60) + 1  # hash64 is 60-bit; (h+1)/DEN is a uniform in (0,1)

ES_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, n_chars,
       ROUND(ln(({hash64_sql("'esample:' || CAST(doc_id AS VARCHAR)")} + 1) / {_ES_DEN}.0) / n_chars, 9) AS es_key
FROM documents
WHERE n_chars > 0
ORDER BY es_key DESC, doc_id LIMIT {_ES_K}
"""


@register("weighted_sample_es", ES_SAMPLE_ORACLE)
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (public: Efraimidis &
    Spirakis 2006), weight = n_chars: P(doc in sample) follows the
    weights with no replacement bias — the standard curation move for
    length/quality-weighted subcorpus draws.  Seeded-hash uniforms make
    it reproducible and revisit-safe; top-k runs as TakeOrdered (k rows
    per partition reach the reducer, never a global sort)."""
    d = spread(load(spark, sf_dir, "documents")).where(F.col("n_chars") > 0)
    u = (
        hash64(F.concat(F.lit("esample:"), F.col("doc_id").cast("string"))) + 1
    ).cast("double") / F.lit(float(_ES_DEN))
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    return (
        d.select("doc_id", "lang", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(_ES_K)
    )


# --- curriculum ordering (difficulty buckets + seeded in-bucket shuffle) -------
# The training-order construction pass: docs are banded into difficulty
# quartiles (length as the proxy signal, easy first), then each band is
# deterministically shuffled by a seeded hash, and the whole corpus gets
# ONE global curriculum index.  Both stages are the engine's
# distributed-rank machinery (range partition + offset cumsum — no
# single-partition window anywhere): ntile_exact for the bands, then
# distributed_rank over (band, shuffle_key) for the order.

CURRICULUM_ORACLE = f"""
WITH b AS (
  SELECT doc_id, n_chars,
         NTILE(4) OVER (ORDER BY n_chars, doc_id) AS band,
         {hash64_sql("'cur:' || CAST(doc_id AS VARCHAR)")} AS shuffle_key
  FROM documents)
SELECT doc_id, n_chars, band,
       ROW_NUMBER() OVER (ORDER BY band, shuffle_key, doc_id) AS global_order
FROM b
ORDER BY global_order
"""


@register("curriculum_order", CURRICULUM_ORACLE)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: difficulty quartiles by length (exact
    NTILE semantics via ntile_exact — range partition + offset cumsum),
    seeded hash shuffle within each band, one global order index via
    distributed_rank.  Bit-identical to the oracle's global-window NTILE
    + ROW_NUMBER, with no single-partition exchange in the plan."""
    from incubator_flink_spark.operators.rank import distributed_rank, ntile_exact

    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "n_chars")
    banded = ntile_exact(d, ["n_chars", "doc_id"], 4, bucket_col="band").withColumn(
        "shuffle_key", hash64(F.concat(F.lit("cur:"), F.col("doc_id").cast("string")))
    )
    ordered = distributed_rank(
        banded, ["band", "shuffle_key", "doc_id"], rank_col="global_order"
    )
    return ordered.select(
        "doc_id", "n_chars", "band", F.col("global_order").cast("bigint").alias("global_order")
    ).orderBy("global_order")


# --- DSIR-style importance selection ------------------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023, public):
# rank raw documents by how much more likely their hashed-feature bag is
# under a TARGET distribution than under the RAW corpus distribution.
# Features are word unigrams hashed into _DSIR_B buckets (the paper's
# hashed n-gram generative model); both bucket models are add-1-smoothed
# count models, so the per-document log importance weight is
#   sum over tokens of [ln p_target(bucket) - ln p_raw(bucket)].
# The target here is the corpus's own English slice (lang = 'en'),
# standing in for the paper's high-quality target corpus.
#
# Scale shape: the model is VOCABULARY-BOUNDED (exactly _DSIR_B rows), so
# training is one 64-key aggregate with map-side combine, scoring is a
# broadcast join over the token stream + one doc-keyed aggregate, and the
# selection is TakeOrdered (top-k, no global window).  Determinism: each
# ln() term is cast to DECIMAL(30,12) (both engines' doubles agree far
# past 12 fractional digits on identical rational inputs — the
# lm_perplexity discipline), summed exactly, and rounded to 6 at the end.

_DSIR_B = 64
_DSIR_K = 100

DSIR_ORACLE = f"""
WITH t AS (SELECT doc_id, lang = 'en' AS is_t, unnest({_TOKS}) AS w FROM documents),
tb AS (SELECT doc_id, is_t, ({hash64_sql("w")}) % {_DSIR_B} AS b FROM t),
stats AS (SELECT b, COUNT(*) AS c_r,
                 SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_t
          FROM tb GROUP BY b),
tot AS (SELECT SUM(c_r) AS t_r, SUM(c_t) AS t_t FROM stats),
model AS (SELECT b,
            CAST(ln((c_t + 1) / CAST(t_t + {_DSIR_B} AS DOUBLE)) AS DECIMAL(30,12))
          - CAST(ln((c_r + 1) / CAST(t_r + {_DSIR_B} AS DOUBLE)) AS DECIMAL(30,12)) AS delta
          FROM stats, tot),
sc AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(delta) AS s
       FROM tb JOIN model USING (b) GROUP BY doc_id)
SELECT doc_id, n_tokens, ROUND(CAST(CAST(s AS VARCHAR) AS DOUBLE), 6) AS iw
FROM sc ORDER BY iw DESC, doc_id LIMIT {_DSIR_K}
"""


@register("dsir_importance_select", DSIR_ORACLE)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 documents by DSIR importance weight (hashed-unigram target
    vs raw bucket models, target = the English slice)."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        F.explode(tokens(F.col("text"))).alias("w"),
    ).select("doc_id", "is_t", (hash64(F.col("w")) % _DSIR_B).alias("b"))
    # persisted: 64 rows — tot and model both derive from it, and without
    # the persist the whole corpus tokenize+aggregate lineage would run
    # TWICE (the loop-input lesson from ARCHITECTURE.md applied to a
    # shared model subtree); the scoring pass below is then the corpus's
    # second and last scan
    stats = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("c_t"),
    ).persist()
    tot = stats.agg(F.sum("c_r").alias("t_r"), F.sum("c_t").alias("t_t"))
    model = stats.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("c_t") + 1) / (F.col("t_t") + F.lit(_DSIR_B))).cast("decimal(30,12)")
            - F.log((F.col("c_r") + 1) / (F.col("t_r") + F.lit(_DSIR_B))).cast("decimal(30,12)")
        ).alias("delta"),
    )
    sc = (
        toks.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("delta").alias("s"))
    )
    return (
        sc.select(
            "doc_id",
            "n_tokens",
            F.round(F.col("s").cast("double"), 6).alias("iw"),
        )
        .orderBy(F.desc("iw"), "doc_id")
        .limit(_DSIR_K)
    )
