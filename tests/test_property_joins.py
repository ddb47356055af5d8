"""Property-based checks (hypothesis): the temporal join operators agree
with a brute-force Python model on arbitrary small inputs — keys colliding,
duplicate timestamps, empty sides, boundary hits."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from prod_data_pipeline_spark.operators.joins import asof_join, time_range_join

ROW = st.tuples(st.integers(0, 2), st.integers(0, 60))  # (key, seconds)
ROWS = st.lists(ROW, min_size=0, max_size=25)

SCHEMA_L = StructType([StructField("k", LongType()), StructField("sec", LongType())])
SCHEMA_R = StructType([StructField("k", LongType()), StructField("sec", LongType())])


def _df(spark, rows, schema):
    df = spark.createDataFrame([(k, s) for k, s in rows], schema)
    return df.withColumn("ts", F.timestamp_micros(F.col("sec") * 1_000_000))


@settings(max_examples=12, deadline=None)
@given(left=ROWS, right=ROWS)
def test_asof_join_matches_model(spark, left, right):
    lf = _df(spark, [(k, s) for k, s in left], SCHEMA_L).withColumn(
        "lid", F.monotonically_increasing_id()
    )
    rf = _df(spark, right, SCHEMA_R)
    got = {
        (r["k"], r["sec"], r["lid"]): (
            None if r["asof_ts"] is None else int(r["asof_ts"].timestamp())
        )
        for r in asof_join(lf, rf, by="k").collect()
    }
    assert len(got) == len(left)
    for (k, s, _lid), matched in got.items():
        cands = [rs for rk, rs in right if rk == k and rs <= s]
        assert matched == (max(cands) if cands else None)


@settings(max_examples=12, deadline=None)
@given(left=ROWS, right=ROWS, lo=st.integers(-20, 5), width=st.integers(1, 15))
def test_time_range_join_matches_model(spark, left, right, lo, width):
    hi = lo + width
    lf = _df(spark, left, SCHEMA_L).withColumn("lid", F.monotonically_increasing_id())
    rf = _df(spark, right, SCHEMA_R)
    out = time_range_join(
        lf, rf, by="k", lower_s=float(lo), upper_s=float(hi)
    ).collect()
    got = sorted((r["lid"], int(r["r_ts"].timestamp())) for r in out)
    lid_rows = {r["lid"]: (r["k"], r["sec"]) for r in lf.collect()}
    expect = sorted(
        (lid, rs)
        for lid, (k, s) in lid_rows.items()
        for rk, rs in right
        if rk == k and s + lo <= rs <= s + hi
    )
    assert got == expect
