"""Embedding-vector math as higher-order Column functions.

Operates on ``array<float>`` columns (the ``embeddings.embedding`` schema).
All math is promoted to double *before* multiplication so Spark and the
DuckDB oracle (which casts unnested elements to DOUBLE) agree bit-for-bit up
to summation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL for a zero vector (undefined similarity), matching DuckDB's
    silent x/0.0 -> NULL — without the NULLIF, Spark's default ANSI mode
    raises DIVIDE_BY_ZERO and one zero embedding (a padding row, a dead
    feature) kills the whole job."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))
