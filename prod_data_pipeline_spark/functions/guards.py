"""Shared non-finite guards (round-11 verdict #4).

Two hazard classes, one contract:

- **Engine-side**: a NULL / ragged / NaN / Inf embedding poisons any
  aggregate it touches (one NaN makes a centroid NaN, which makes every
  downstream distance NaN, which makes argmin/argmax engine-dependent).
  ``invalid_embedding`` is the single expression both the strict kernels
  (covariance: raise) and the degrading kernels (centroid trainers:
  exclude) decide with — the same validity rule the Arrow kernels apply
  via ``similarity._emb_matrix``, so expression-side and pandas-side
  paths can never disagree about which rows are valid.

- **Driver-side**: Python bound checks silently pass on NaN because
  every comparison with NaN is False (``NaN <= bound`` -> False, but so
  is ``NaN > bound`` — the round-9 int40-guard bypass).  Any value that
  crosses the JVM->driver boundary to gate a decision or ship as a plan
  literal must go through ``assert_finite`` first.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def invalid_embedding(e: Column | str, dim: int | None = None) -> Column:
    """True for rows whose embedding can poison numeric aggregates:
    NULL array, wrong length (when ``dim`` is given), or any
    NULL/NaN/±Inf element.  NULL-safe: always returns true/false, never
    NULL (a NULL verdict would slip through ``filter(~bad)``)."""
    e = F.col(e) if isinstance(e, str) else e
    inf = F.lit(float("inf"))
    bad = e.isNull() | F.exists(e, lambda xi: xi.isNull() | xi.isNaN() | (F.abs(xi) == inf))
    if dim is not None:
        bad = bad | (F.size(e) != dim)
    return bad


def finite_embeddings(df: DataFrame, emb_col: str = "embedding", dim: int | None = None) -> DataFrame:
    """Exclusion form of the guard: keep only rows with a fully finite
    embedding — the ``_emb_matrix`` mask-False contract expressed as a
    filter, for trainers where a corrupt row should drop out of the
    statistics rather than fail the job (centroids, codebooks,
    quantizer fits).  Strict kernels (covariance) should instead count
    ``invalid_embedding`` rows and raise."""
    return df.filter(~invalid_embedding(F.col(emb_col), dim))


def assert_finite(x, ctx: str) -> float:
    """Driver-side guard for values that gate a decision or ship as plan
    literals: raises ValueError on None/NaN/±Inf instead of letting a
    NaN sail through a bound comparison (every Python comparison with
    NaN is False — the silent-bypass class fixed in round 10 for the
    int40 quantizer).  Returns the value so call sites can wrap
    in-line."""
    if x is None or not math.isfinite(x):
        raise ValueError(f"{ctx}: non-finite value {x!r} reached a driver-side decision")
    return float(x)
