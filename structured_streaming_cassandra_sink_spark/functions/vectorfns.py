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
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
