"""Edit-distance fuzzy matching via deletion neighborhoods (public
SymSpell recipe, Wolf Garbe): two strings within edit distance 1 share at
least one member of their single-character-deletion neighborhoods, so an
equi-join on deletion variants finds every candidate pair — work
proportional to colliding variants, never the all-pairs cross product —
and an exact levenshtein verify gives precision 1.0.

Scale shape (the same candidate-first discipline as the MinHash/SimHash
dedup family): variant generation is a scan-proportional explode (|w|+1
variants per word), the self-join keys on the variant string, and the
verify runs only on candidates.  At 100 TB vocabularies the variants
would be reduced to 60-bit hashes before the shuffle exactly like
doc_shingle_set; kept as strings here because corpus vocabularies are
tiny relative to the corpora.

Everything is Catalyst expressions (transform/sequence/substr/
levenshtein) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood(col: Column) -> Column:
    """array<string>: the string itself plus every single-character
    deletion (the d=1 SymSpell index keys)."""
    n = F.length(col)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(col.substr(F.lit(1), i - 1), col.substr(i + 1, n)),
    )
    return F.concat(F.array(col), F.when(n >= 1, dels).otherwise(F.array().cast("array<string>")))


def fuzzy_pairs(
    words: DataFrame, word_col: str = "w", max_dist: int = 1
) -> DataFrame:
    """All distinct pairs (word_a < word_b) with levenshtein distance <=
    max_dist (must be 1 — the neighborhood depth generated).  Candidates
    from the deletion-variant equi-join; exact levenshtein verify."""
    if max_dist != 1:
        raise ValueError("deletion neighborhood is generated for max_dist=1")
    from incubator_flink_spark.catalog import spread

    idx = spread(words).select(
        F.col(word_col).alias("__w"),
        F.explode(deletion_neighborhood(F.col(word_col))).alias("__var"),
    ).distinct()
    a = idx.select(F.col("__w").alias("word_a"), "__var")
    b = idx.select(F.col("__w").alias("word_b"), "__var")
    cand = (
        a.join(b, "__var")
        .where(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("word_a", "word_b"))
        .where(F.col("dist") <= max_dist)
    )
