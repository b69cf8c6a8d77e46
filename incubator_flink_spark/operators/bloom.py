"""Deterministic Bloom-filter blocklist pre-filtering (public algorithm:
Bloom 1970; the pattern is Spark's own runtime bloom-filter join
pushdown, here as an explicit operator the way a curation pipeline uses
it: "drop every document on a huge corpus whose key appears in a
dim-sized blocklist, without shuffling the corpus").

Scale shape (100 TB):
- the blocklist (dim-sized: URLs, licence hashes, contaminated doc ids)
  is expanded to k bit positions per key and compacted into an m-bit
  bitmap of m/64 longs — ~1.25 MB for m=10M bits — which ships to every
  task as a broadcast/literal array: corpus membership tests are
  MAP-SIDE, zero shuffle, zero join on the big side;
- bloom hits (true matches + the controlled false-positive mass) are the
  only rows that reach the exact verification join, so the join is
  candidate-proportional — the anti-join's shuffle shrinks from corpus-
  sized to hit-sized;
- the final output is exact: false positives are eliminated by the
  verify join, so the bloom changes COST, never semantics.

Determinism: bit positions come from the same seeded universal-hash
family as the MinHash/CMS machinery (integer-only), so the candidate
set — including every false positive — is a pure function of the data
and reproducible in the DuckDB oracle via position-set logic.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_flink_spark.functions.hashing import (
    P,
    hash64,
    hash64_sql,
    universal_bucket,
    universal_bucket_sql,
)

BLOOM_K = 3

_rng = random.Random(1618033)
BLOOM_AB = [(_rng.randrange(1, P), _rng.randrange(0, P)) for _ in range(BLOOM_K)]


def bloom_pos(h: Column, i: int, m_bits: int) -> Column:
    """Bit position of base-hash ``h`` under the i-th hash, in [0, m)
    (the shared seeded universal-hash family in functions/hashing.py)."""
    a, b = BLOOM_AB[i]
    return universal_bucket(h, a, b, m_bits)


def bloom_pos_sql(hexpr: str, i: int, m_bits: int) -> str:
    a, b = BLOOM_AB[i]
    return universal_bucket_sql(hexpr, a, b, m_bits)


def bloom_build(blocklist: DataFrame, key_col: str, m_bits: int) -> list[int]:
    """The m-bit filter as a list of m/64 longs.  The driver collects
    only the DISTINCT bit positions (<= k * |blocklist| ints, dim-sized —
    the same order as any broadcast dim), never blocklist rows."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    h = hash64(F.col(key_col))
    pos_arr = F.array(*[bloom_pos(h, i, m_bits) for i in range(BLOOM_K)])
    rows = (
        # NULL keys hash to NULL positions and can never match under the
        # join semantics bloom_might_contain implements — drop them here
        # instead of letting a None position crash the bit loop
        blocklist.where(F.col(key_col).isNotNull())
        .select(F.explode(pos_arr).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        p = r["pos"]
        words[p // 64] |= 1 << (p % 64)
    # keep within signed int64 for the literal array
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(key: Column, words: list[int], m_bits: int) -> Column:
    """Map-side membership test: all k bit positions set in the literal
    bitmap.  Pure Catalyst — element_at on a literal array + bit shifts —
    so it rides whole-stage codegen on the corpus scan."""
    # one array literal, not m/64 chained nodes (planning cost); the cast
    # pins array<bigint> even when every word happens to fit in int32
    bitmap = F.lit([int(w) for w in words]).cast("array<bigint>")
    h = hash64(key)
    checks = []
    for i in range(BLOOM_K):
        pos = bloom_pos(h, i, m_bits)
        word = F.element_at(bitmap, (pos / 64).cast("int") + 1)
        # getbit takes a COLUMN position (the shift functions demand a
        # python-literal bit count) and reads two's-complement bits, which
        # is exactly the signed-long encoding bloom_build emits
        checks.append(F.getbit(word, (pos % 64).cast("int")) == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    # NULL keys can match nothing (SQL join semantics: NULL never equals
    # a blocklist key), so the test must be FALSE, not NULL — a NULL
    # predicate would drop the row from both where(hit) and where(~hit)
    return F.coalesce(out, F.lit(False))


def bloom_filter_join(
    corpus: DataFrame,
    blocklist: DataFrame,
    corpus_key: str,
    block_key: str,
    m_bits: int,
    mode: str = "anti",
) -> tuple[DataFrame, DataFrame]:
    """(result, candidates): corpus anti/semi-joined against the
    blocklist with a bloom pre-filter.

    ``candidates`` are the bloom hits (exposed for auditing the FP
    rate); ``result`` is exact — candidates are verified with a real
    join on the key, and for ``anti`` mode the verified hits are removed
    from the corpus by comparing against the candidate set only (the
    non-candidate mass never enters any join)."""
    if mode not in ("anti", "semi"):
        raise ValueError("mode must be 'anti' or 'semi'")
    words = bloom_build(blocklist, block_key, m_bits)
    hit = bloom_might_contain(F.col(corpus_key), words, m_bits)
    candidates = corpus.where(hit)
    bl = F.broadcast(blocklist.select(F.col(block_key).alias(corpus_key)).distinct())
    if mode == "semi":
        return candidates.join(bl, corpus_key, "semi"), candidates
    # anti = everything except verified hits; non-candidates pass for free
    kept = corpus.where(~hit).unionByName(candidates.join(bl, corpus_key, "anti"))
    return kept, candidates
