"""Vector column expressions — all JVM-side (no Python UDFs).

Dot products / norms over array<float|double> columns via
``zip_with``/``aggregate`` higher-order functions: they run inside
whole-stage codegen, so similarity search stays on the Tungsten fast path.
The fold is sequential left-to-right, which makes double summation
deterministic — required for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Deterministic sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def sq_l2_dist(a: Column, b: Column) -> Column:
    """Deterministic sequential-fold squared L2 distance of two double
    arrays (no sqrt: monotone for ranking, one fewer float op to match
    across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity, zero-norm-safe.

    try_divide yields NULL (not NaN) when either vector has zero norm.
    NULL is the right poison value here: Spark sorts NaN ABOVE every
    number, so a NaN sim would pass `sim >= threshold` filters and rank
    #1 in desc-order top-k windows, while NULL is excluded by both.
    """
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
