"""Cross-engine determinism of the long-numerator sum recipe
(plans/query_registry.py::dsum / dnum / num_to_double, round 10).

The driver's correctness gate runs at sf0.01, where every numerator sum
fits in 2^53 and ANY reasonable recipe would agree; the regime that
matters is the one the gate cannot see — numerator sums past 2^53,
where the final long->double cast rounds and a Spark/DuckDB recipe
mismatch (e.g. DuckDB's HUGEINT->DOUBLE instead of the pinned
BIGINT->DOUBLE) would silently hash-diverge.  These tests drive that
regime directly with adversarial values: half-way rounding boundaries,
negatives, NULLs, and magnitudes that push the int64 sum past 2^53.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from prod_data_pipeline_spark.plans.query_registry import dnum, dsum, num_to_double


def _duck_dsum(values: list[float | None], scale: int) -> float:
    m = f"{10**scale}.0"
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    return con.execute(
        f"SELECT CAST(CAST(SUM(CAST(FLOOR(x * {m} + 0.5) AS BIGINT)) AS BIGINT)"
        f" AS DOUBLE) / {m} FROM t"
    ).fetchone()[0]


def _spark_dsum(spark, values: list[float | None], scale: int) -> float:
    df = spark.createDataFrame([(v,) for v in values], "x double")
    return df.agg(dsum("x", scale).alias("s")).first()["s"]


CASES = [
    # name, scale, values
    ("cents-small", 2, [1.01, 2.02, 3.03, 0.05, 99.99]),
    # half-way boundaries: x*100 lands exactly on k+0.5 only when the
    # double is exact there — 0.615 is NOT (stored below), 61.5/100
    # variants ARE; both engines must agree either way
    ("half-way", 2, [0.615, 0.125, 0.005, 2.675, 1.115]),
    ("negatives", 4, [-0.1234, 3.5, -2.0001, 0.0, -0.00005]),
    ("nulls-skipped", 2, [1.5, None, 2.25, None]),
    # past 2^53: 60k values of ~1.1e5 at scale 6 -> numerator sum ~6.6e15
    # (> 2^53 = 9.0e15 when doubled below), exercising the rounded cast
    ("past-2pow53", 6, [104949.5 + (i % 997) * 0.000001 for i in range(1500)] * 80),
]


@pytest.mark.parametrize("name,scale,values", CASES, ids=[c[0] for c in CASES])
def test_dsum_matches_duckdb_bitwise(spark, name, scale, values):
    got = _spark_dsum(spark, values, scale)
    want = _duck_dsum(values, scale)
    assert got == want, f"{name}: spark {got!r} != duckdb {want!r}"


def test_past_2pow53_actually_past_2pow53():
    """Guard the test's own premise: the big case's numerator sum must
    exceed 2^53, else it degenerates into the exact regime."""
    _, scale, values = CASES[-1][0], CASES[-1][1], CASES[-1][2]
    numer = sum(round(v * 10**scale) for v in values)
    assert numer > 2**53
    assert numer < 2**63  # and inside the documented int64 bound


def test_dnum_two_level_equals_single_level(spark):
    """Re-summing numerators level-by-level is EXACT (int64 addition
    commutes), so a two-level dnum chain must equal the flat dsum —
    the property the q10/RFM/salted-count rewrites rely on."""
    rows = [(i % 7, 0.01 * i + (i % 3) * 1000.0) for i in range(5000)]
    df = spark.createDataFrame(rows, "k int, x double")
    flat = df.agg(dsum("x").alias("s")).first()["s"]
    two = (
        df.groupBy("k")
        .agg(dnum("x").alias("n"))
        .agg(num_to_double(F.sum("n")).alias("s"))
        .first()["s"]
    )
    assert flat == two


def test_dsum_partition_order_independent(spark):
    """The whole point of the recipe: the same multiset of values sums to
    the same double at any partitioning (int64 partials are exact)."""
    values = [((i * 2654435761) % 100000) * 0.01 - 250.0 for i in range(20000)]
    a = _spark_dsum(spark, values, 2)
    df1 = spark.createDataFrame([(v,) for v in values], "x double").repartition(97)
    b = df1.agg(dsum("x", 2).alias("s")).first()["s"]
    df2 = spark.createDataFrame([(v,) for v in reversed(values)], "x double").coalesce(1)
    c = df2.agg(dsum("x", 2).alias("s")).first()["s"]
    assert a == b == c == _duck_dsum(values, 2)
