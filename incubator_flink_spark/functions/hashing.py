"""Portable deterministic hashing, identical in Spark and DuckDB.

Base hash: the top 15 hex digits of md5 interpreted as a 60-bit integer —
both engines compute md5 identically, so
    Spark : conv(substring(md5(s),1,15),16,10)::bigint
    DuckDB: CAST('0x'||substring(md5(s),1,15) AS BIGINT)
agree exactly.  MinHash permutations are universal hashes
h_i(x) = (a_i*(x mod P) + b_i) mod P over the 31-bit prime P=1e9+7;
all arithmetic stays within int64 (a_i < P, x mod P < P → product < 2^60).

These drive the MinHash/SimHash dedup operators (SURVEY.md Phase 5 /
"beyond-reference" training-data pipeline ops).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007

# Fixed universal-hash coefficients (seeded; inlined into oracle SQL too).
_rng = random.Random(42)
NUM_MINHASHES = 8
MINHASH_AB = [(_rng.randrange(1, P), _rng.randrange(0, P)) for _ in range(NUM_MINHASHES)]

SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15  # 4 bands x 15 bits


def hash64(col: Column) -> Column:
    """60-bit md5-derived hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """Same hash, DuckDB SQL text."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_expr(h: Column, i: int) -> Column:
    """i-th MinHash permutation of a base hash column (Spark side)."""
    a, b = MINHASH_AB[i]
    return (F.lit(a) * (h % F.lit(P)) + F.lit(b)) % F.lit(P)


def minhash_sql(hexpr: str, i: int) -> str:
    a, b = MINHASH_AB[i]
    return f"(({a} * (({hexpr}) % {P}) + {b}) % {P})"


def universal_bucket(h: Column, a: int, b: int, mod: int) -> Column:
    """((a*(h%P)+b) % P) % mod — the shared universal-hash bucket behind
    the CMS rows, bloom positions, and any future seeded bucketing.
    int64-safe: a < P and h%P < P keep the product under 2^60."""
    return ((F.lit(a) * (h % F.lit(P)) + F.lit(b)) % F.lit(P)) % F.lit(mod)


def universal_bucket_sql(hexpr: str, a: int, b: int, mod: int) -> str:
    """DuckDB twin of universal_bucket."""
    return f"((({a} * (({hexpr}) % {P}) + {b}) % {P}) % {mod})"
