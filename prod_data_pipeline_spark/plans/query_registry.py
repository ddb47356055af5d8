"""Query registry: the QuerySpec dataclass, the QUERIES dict, the
@query registration decorator, and the shared tiny helpers every
chunk module uses (split out of the former monolithic
plans/queries.py in round 10)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prod_data_pipeline_spark.schemas import TESTDATA_EVENT_TYPES
from prod_data_pipeline_spark.session import truncate_lineage, tune
from prod_data_pipeline_spark.sources.readers import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None => driver records rows-only check
    headline: bool = False  # included in bench.py
    tags: tuple = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False, tags: tuple = ()):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, headline=headline, tags=tags)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


def dsum(c, scale: int = 2) -> F.Column:
    """Deterministic fixed-point sum as double — the long-numerator recipe.

    ``floor(x * 10^scale + 0.5)`` quantizes each value to its integer
    numerator in pure codegen'd double ops (no BigDecimal anywhere —
    measured 5x cheaper than the former ``SUM(CAST(x AS DECIMAL(18,s)))``
    on the sf1-equivalent q1 shape: 1.3 s -> 0.28 s); the numerators sum
    exactly in int64 (order-independent), and the single final
    long->double cast + division by the exactly-representable 10^scale
    are the same IEEE ops in every engine.  The DuckDB oracle mirror is
    ``CAST(CAST(SUM(CAST(FLOOR((x) * 10^s.0 + 0.5) AS BIGINT)) AS
    BIGINT) AS DOUBLE) / 10^s.0`` (inner BIGINT cast because DuckDB's
    SUM(BIGINT) widens to HUGEINT, whose double conversion need not
    round like int64's).

    Bounds: requires ``|sum(x)| * 10^scale < 2^63`` (int64 numerator
    sum).  At scale=6 that is ~9.2e12 in summed value per group —
    petabyte-scale fact tables stay inside it for per-group sums; a
    global total approaching the bound should drop a digit of scale.
    NULLs are skipped identically in both engines (floor propagates
    NULL).  Values beyond 2^53 in the final sum round once in the
    long->double cast — deterministic, error <= 2^-53 relative."""
    c = F.col(c) if isinstance(c, str) else c
    m = F.lit(float(10**scale))
    return F.sum(F.floor(c * m + F.lit(0.5))).cast("double") / m


def dnum(c, scale: int = 2) -> F.Column:
    """The exact int64 numerator sum behind :func:`dsum` — for two-level
    aggregations (per-key partial sum re-aggregated upstream, salted
    two-phase counts).  Keep the LONG flowing through every intermediate
    level so each re-sum stays exact integer arithmetic, and convert once
    at the very end with ``num_to_double``.  Summing the *double* form
    level-by-level instead would accumulate order-dependent float error —
    exactly the nondeterminism dsum exists to rule out."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(F.floor(c * F.lit(float(10**scale)) + F.lit(0.5)))


def num_to_double(c, scale: int = 2) -> F.Column:
    """Final numerator->value conversion for a dnum chain: one long->double
    cast then division by the exactly-representable 10^scale (same IEEE
    ops in Spark and DuckDB; oracle mirror ``CAST(CAST(x AS BIGINT) AS
    DOUBLE) / 10^s.0``)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("double") / F.lit(float(10**scale))


_VALID_TYPES_SQL = ", ".join(f"'{t}'" for t in TESTDATA_EVENT_TYPES)


