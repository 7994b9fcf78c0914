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
    not once per pair). Zero-norm (all-zero) vectors yield an EXPLICIT
    NULL on every engine: Spark's x/0 is null while DuckDB's is
    inf/nan (and NaN sorts above everything there, silently passing
    ``>= threshold`` filters) — the guard pins both to NULL-undefined."""
    return F.when(norm_a * norm_b > 0, dot(a, b) / (norm_a * norm_b)).otherwise(
        F.lit(None).cast("double")
    )
