"""Text-analysis primitives for the training-data pipeline operators:
tokenization, word shingles, stopword profiles, and the BPE-ish token
regex.  Everything is a JVM-side Catalyst expression (split / transform /
filter / regexp) — no Python UDFs in the hot path — with a matching
DuckDB SQL form for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")

LANG_MARKERS = {
    "en": ("the", "is", "and"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "de": ("der", "und", "das"),
    "zh": ("de", "shi", "le"),
}
LANG_PRIORITY = ("en", "fr", "es", "de", "zh")


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased text."""
    return F.split(F.lower(col), " ")


def tokens_sql(expr: str) -> str:
    return f"string_split(lower({expr}), ' ')"


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-shingles: [' '.join(toks[j:j+k]) for j in 0..n-k]."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda j: F.array_join(F.slice(toks, j, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(toks_expr: str, k: int = 3) -> str:
    # generate_series(1, n-k+1) is empty when n < k, matching the Spark guard.
    return (
        f"list_transform(generate_series(1, greatest(len({toks_expr}) - {k - 1}, 0)), "
        f"j -> array_to_string(({toks_expr})[j:j+{k - 1}], ' '))"
    )


def stopword_count(toks: Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_count_sql(toks_expr: str, words: tuple[str, ...] = STOPWORDS) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks_expr}, t -> t IN ({lst})))"


# --- PII redaction (training-data pipeline scrubbing pass) --------------------
# Patterns are kept to the regex subset with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): char classes + bounded repeats only.

PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    "phone": (r"\+?[0-9][0-9()\-. ]{6,}[0-9]", "<PHONE>"),
    "ip": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    "ssn": (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
}
# longest-match-first application order: SSN/IP before the generic phone
# run so a dotted quad is not half-eaten as a phone number
PII_ORDER = ("email", "ssn", "ip", "phone")


def redact_pii(col: Column) -> Column:
    """Replace each PII pattern with its placeholder, returning a struct
    ``(redacted, n_email, n_phone, n_ip, n_ssn)``. Pure Catalyst
    (regexp_count/regexp_replace) — no UDF, safe in a 100 TB scrub pass."""
    counts = {name: F.regexp_count(col, F.lit(pat)) for name, (pat, _) in PII_PATTERNS.items()}
    red = col
    for name in PII_ORDER:
        pat, repl = PII_PATTERNS[name]
        red = F.regexp_replace(red, pat, repl)
    return F.struct(
        red.alias("redacted"),
        *[counts[n].cast("int").alias(f"n_{n}") for n in PII_ORDER],
    )
