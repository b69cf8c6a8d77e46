"""Edit-distance fuzzy matching via deletion neighborhoods (public
SymSpell recipe, Wolf Garbe): two strings within edit distance d share at
least one member of their depth-d deletion neighborhoods (delete the
substituted/deleted chars from one side and the substituted/inserted
chars from the other — at most d each), so an equi-join on deletion
variants finds every candidate pair — work proportional to colliding
variants, never the all-pairs cross product — and an exact levenshtein
verify gives precision 1.0.  Recall is therefore exactly 1.0 at both
supported depths (d=1 and d=2).

Scale shape (the same candidate-first discipline as the MinHash/SimHash
dedup family): variant generation is a scan-proportional explode (|w|+1
variants per word at d=1, ~|w|^2/2 at d=2), the self-join keys on a
64-bit hash of the variant — an 8-byte shuffle key regardless of word
length, exactly like doc_shingle_set — and the verify runs only on
candidates, so a hash collision can add a candidate but never a wrong
answer.

Everything is Catalyst expressions (transform/sequence/substr/
levenshtein) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_flink_spark.functions.hashing import hash64


def deletion_neighborhood(col: Column, max_dist: int = 1) -> Column:
    """array<string>: the string itself plus every deletion of up to
    ``max_dist`` (1 or 2) characters — the SymSpell index keys."""
    if max_dist not in (1, 2):
        raise ValueError("deletion neighborhoods are generated for max_dist in (1, 2)")
    n = F.length(col)
    empty = F.array().cast("array<string>")
    d1 = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(col.substr(F.lit(1), i - 1), col.substr(i + 1, n)),
    )
    out = F.concat(F.array(col), F.when(n >= 1, d1).otherwise(empty))
    if max_dist == 2:
        # delete positions i < j; CASE guards keep sequence() ascending
        # (sequence(1, 0) would generate a DESCENDING range, not empty)
        d2 = F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, n),
                    lambda j: F.concat(
                        col.substr(F.lit(1), i - 1),
                        col.substr(i + 1, j - i - 1),
                        col.substr(j + 1, n),
                    ),
                ),
            )
        )
        out = F.concat(out, F.when(n >= 2, d2).otherwise(empty))
    return out


def fuzzy_pairs(
    words: DataFrame, word_col: str = "w", max_dist: int = 1
) -> DataFrame:
    """All distinct pairs (word_a < word_b) with levenshtein distance <=
    max_dist (1 or 2).  Candidates from the deletion-variant equi-join
    keyed on hash64(variant); exact levenshtein verify (so precision is
    1.0 even across hash collisions, and recall 1.0 by the SymSpell
    neighborhood-intersection property)."""
    from incubator_flink_spark.catalog import spread

    idx = (
        spread(words)
        .select(
            F.col(word_col).alias("__w"),
            F.explode(deletion_neighborhood(F.col(word_col), max_dist)).alias("__var"),
        )
        .select("__w", hash64(F.col("__var")).alias("__vh"))
        .distinct()
    )
    a = idx.select(F.col("__w").alias("word_a"), "__vh")
    b = idx.select(F.col("__w").alias("word_b"), "__vh")
    cand = (
        a.join(b, "__vh")
        .where(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("word_a", "word_b"))
        .where(F.col("dist") <= max_dist)
    )
