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
    """Exact decimal sum cast back to double (deterministic across engines)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


_VALID_TYPES_SQL = ", ".join(f"'{t}'" for t in TESTDATA_EVENT_TYPES)


