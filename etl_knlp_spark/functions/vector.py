"""Vector math over array<float> embedding columns — pure Catalyst
column expressions (no UDFs), used by similarity search and
embedding-based dedup (SURVEY.md §2.12).

Everything computes in double: float32 elements cast exactly to double,
and the sequential left-to-right `F.aggregate` fold makes per-row
results bit-deterministic (unlike shuffled aggregate sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + sequential fold (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision."""
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))
