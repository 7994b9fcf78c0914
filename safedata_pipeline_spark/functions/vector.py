"""Shared vector column functions (array<double> embeddings).

Array folds evaluate elements in fixed order — deterministic floating
point, identical across engines — so cosine scores computed here are
oracle-comparable. These are for *scoring* (top-k candidates, pair
thresholds); bulk index math (LSH buckets, IVF cells) belongs in the
Arrow-batched GEMM UDFs in ``operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, sequential fold (deterministic FP order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm(v: Column) -> Column:
    """Euclidean norm, sequential fold."""
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed norms (norms are computed once per row,
    not once per pair)."""
    return dot(a, b) / (norm_a * norm_b)
