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
    """Dot product via zip_with + sequential fold (JVM-side, no UDF).
    General (any length) but the higher-order lambda is interpreted —
    prefer `dot_fixed` in hot pairwise loops when the dim is known."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# NOTE: a "flat" dot product (64 literal-index element_at terms chained
# with +) was tried as a codegen-friendly alternative and MEASURED
# SLOWER than the fold at dim=64 (2.5s → 5.2s on the sf0.1 pair join —
# the giant expression blows past codegen method limits and falls back
# to interpreted eval with per-element bounds checks). The fold stays.


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision."""
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))
