"""Vector expression helpers over array<float|double> embedding columns.

Pure Catalyst higher-order functions (zip_with / aggregate / transform):
the dot products run inside codegen, no Python, no UDF serde. For the
genuinely vectorized path (e.g. large batched matmul) see
operators/similarity.py's pandas-UDF variant.

All math is done in DOUBLE: float32 accumulation order differs across
engines; double sequential accumulation is reproducible against the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (0.0 + x1 + x2 + ... left-to-right).

    Deliberately the higher-order fold, NOT an unrolled element_at chain:
    measured on dim-64 doubles, one fold per pair runs ~4x faster than 64
    inline element_at terms (the giant generated method defeats JIT) and
    keeps the expression tree O(1) in plan size. The fold order is fixed,
    so results are reproducible against the sequential-SQL oracle.

    Callers on pairwise paths must PRECOMPUTE norms per row (see
    operators/similarity.py) — cosine() per pair triples the fold work.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
