"""Vector math over ``array<float|double>`` columns as pure SQL expressions.

No Python boundary: ``aggregate``/``zip_with`` run inside whole-stage codegen,
which is what lets brute-force similarity scans survive 100 TB — the dot
product is a tight JVM loop per row, not an Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array columns (double accumulator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe on zero norms (returns NULL)."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom != 0.0, dot_expr(a, b) / denom)
