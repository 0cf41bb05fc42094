"""Text expression helpers — tokens, shingles, fingerprints, quality signals.

All pure Catalyst Column expressions (no UDFs): they compose into any
query and stay inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the testdata is single-space separated)."""
    return F.split(col, " ")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Built with transform(sequence(...)) — a generator expression, not a
    UDF. Docs shorter than n tokens yield an empty array (sequence() would
    otherwise produce a DESCENDING range — guarded).
    """
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. md5 is bit-identical across engines (unlike
    murmur/xxhash which are implementation-detail), so exact-dedup results
    are portable and oracle-checkable."""
    return F.md5(F.lower(F.regexp_replace(col, r"\s+", " ")))


def seeded_hash64(col: Column, seed: int) -> Column:
    """One of a family of 64-bit hash functions, derived by salting
    xxhash64 — the MinHash permutation family."""
    return F.xxhash64(F.concat(F.lit(f"s{seed}:"), col))
