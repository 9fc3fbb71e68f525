"""Vector math over ``array<float|double>`` embedding columns.

Pure higher-order-function compositions (``aggregate``/``zip_with``) —
JVM-side, no UDF, no shuffle; the building blocks for similarity search
and embedding near-dup (driver-mandated extensions, SURVEY.md §2f).

All functions compute in double precision regardless of the array's
element type so results are stable across storage precisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine", "normalize"]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def normalize(a: Column) -> Column:
    """Unit-normalize (double). Pre-normalizing the corpus once turns
    every later cosine into a plain dot product — at 100 TB the
    normalize is a one-off write, the dot is the repeated hot path."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x.cast("double") / n))
