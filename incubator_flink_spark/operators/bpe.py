"""Distributed BPE tokenizer training (public algorithm: Sennrich et al.
2016 "Neural Machine Translation of Rare Words with Subword Units";
distributed formulation as in the public Hugging Face tokenizers /
SentencePiece docs).  The reference engine has no tokenizer-training
operator (beyond-reference scope, training-data pipeline family).

Scale shape (100 TB):
- the corpus-sized pass happens ONCE: word frequencies are one shuffle on
  the word string, producing a VOCABULARY-bounded (word, freq) table —
  every later round runs on that table, never on the corpus;
- per merge round, adjacent-symbol-pair counts are a distributed
  aggregation over the vocab table (map-side combined, pair-keyed) and
  only the single argmax row is collected to the driver;
- the merge itself is applied to the vocab table with a pure-Catalyst
  ``aggregate`` over the symbol array (zip-with-next + skip-flag
  accumulator) — no Python in the loop at all;
- each round ends with ``localCheckpoint`` so the logical plan stays
  O(1) across rounds (same lineage-truncation discipline as
  operators/graph.py's bulk iterations).

Determinism: integer frequencies, and the argmax tiebreak is total
(count DESC, left ASC, right ASC), so the learned merge sequence is a
pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_flink_spark.functions.text import tokens

END_MARK = "_"  # end-of-word marker appended as a final symbol


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): corpus word frequencies — the one corpus-sized
    shuffle in BPE training."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def to_symbols(vocab: DataFrame, end_mark: bool = True) -> DataFrame:
    """(word, freq, syms): each word split into single-character symbols,
    plus the end-of-word marker.  Map-only over the vocab table."""
    syms = F.split(F.col("word"), "")
    # Spark's split on "" yields the characters without a trailing "".
    if end_mark:
        syms = F.concat(syms, F.array(F.lit(END_MARK)))
    return vocab.select("word", "freq", syms.alias("syms"))


def pair_counts(sym_vocab: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent-symbol pair counts weighted by word
    frequency.  Vocab-sized aggregation, pair-keyed shuffle."""
    n = F.size(F.col("syms"))
    pairs = F.arrays_zip(
        F.slice(F.col("syms"), 1, n - 1).alias("l"),
        F.slice(F.col("syms"), 2, n - 1).alias("r"),
    )
    return (
        sym_vocab.where(n >= 2)
        .select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_pair(sym_vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one BPE merge (left, right) -> left||right to every word's
    symbol array.  Pure Catalyst: zip each symbol with its successor,
    then fold with a (out, skip) accumulator — when the pair matches,
    emit the merged symbol and skip the next element."""
    syms = F.col("syms")
    n = F.size(syms)
    zipped = F.arrays_zip(
        syms.alias("cur"),
        F.concat(F.slice(syms, 2, n - 1), F.array(F.lit(None).cast("string"))).alias("nxt"),
    )
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )
    merged = F.aggregate(
        zipped,
        init,
        lambda acc, e: F.when(
            acc["skip"], F.struct(acc["out"].alias("out"), F.lit(False).alias("skip"))
        )
        .when(
            (e["cur"] == F.lit(left)) & (e["nxt"].eqNullSafe(F.lit(right))),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(left + right))).alias("out"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(e["cur"])).alias("out"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda acc: acc["out"],
    )
    return sym_vocab.select("word", "freq", merged.alias("syms"))


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, sym_vocab): ``merges`` is a driver-built DataFrame
    (step, left, right, cnt) in merge order; ``sym_vocab`` the final
    (word, freq, syms) segmentation.  Stops early if no pair repeats."""
    spark = docs.sparkSession
    vocab = to_symbols(word_freqs(docs, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["cnt"]
        merges.append((step, left, right, cnt))
        vocab = merge_pair(vocab, left, right).localCheckpoint(eager=True)
    schema = "step INT, left STRING, right STRING, cnt BIGINT"
    return spark.createDataFrame(merges, schema), vocab


def bpe_segment_stats(sym_vocab: DataFrame) -> DataFrame:
    """(n_words, vocab_size, total_tokens): corpus-level segmentation
    statistics after training — ``total_tokens`` is the encoded corpus
    length under the learned merges (each exploded symbol occurrence
    contributes its word's corpus frequency), ``vocab_size`` the number
    of distinct subword symbols in use.  One scan of the vocab table."""
    per_sym = sym_vocab.select("word", "freq", F.explode("syms").alias("sym"))
    return per_sym.agg(
        F.countDistinct("word").alias("n_words"),
        F.countDistinct("sym").alias("vocab_size"),
        F.sum("freq").alias("total_tokens"),
    )


def bpe_encode_stats(
    docs: DataFrame,
    sym_vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token count under the trained segmentation: corpus
    words join the vocab-bounded (word -> |syms|) table — the "apply the
    tokenizer at corpus scale" pass.  One corpus-sized explode + one
    broadcastable vocab join + one doc-keyed aggregate.

    The join is INNER: with the self-trained vocab every corpus word is
    present; to encode a DIFFERENT corpus, extend the vocab first (OOV
    words would silently vanish from the counts otherwise)."""
    wlen = sym_vocab.select("word", F.size("syms").alias("n_toks"))
    words = docs.select(
        F.col(id_col).alias("__id"), F.explode(tokens(F.col(text_col))).alias("word")
    ).where(F.col("word") != "")
    return (
        words.join(F.broadcast(wlen), "word")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_words"), F.sum("n_toks").alias("n_bpe_tokens"))
        .withColumnRenamed("__id", id_col)
    )
