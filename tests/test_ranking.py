"""operators.ranking: exact distributed rank / NTILE / quantiles agree
with the single-sort window answers on randomized data, including tie
and tiny-group edges."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from prod_data_pipeline_spark.operators.ranking import (
    bucketed_global_rank,
    exact_quantiles,
    ntile_from_rank,
)


def _rand_df(spark, n=5003, seed=11, dup_every=7):
    rng = random.Random(seed)
    # every dup_every-th row repeats the previous value: exercises ties
    rows, last = [], None
    for i in range(n):
        v = last if (i % dup_every == 0 and last is not None) else rng.uniform(0, 100)
        rows.append((i, v))
        last = v
    return spark.createDataFrame(rows, "id long, v double")


def test_rank_matches_global_sort(spark):
    df = _rand_df(spark)
    mine = bucketed_global_rank(df, ["v", "id"], n_buckets=16)
    ref = df.withColumn("rrank", F.row_number().over(Window.orderBy("v", "id")))
    assert mine.join(ref, ["id"]).filter(F.col("rank") != F.col("rrank")).count() == 0
    assert mine.count() == df.count()


def test_grouped_rank_and_totals(spark):
    df = _rand_df(spark).withColumn("g", (F.col("id") % 4).cast("int"))
    mine = bucketed_global_rank(df, ["v", "id"], by=["g"], n_buckets=8)
    w = Window.partitionBy("g").orderBy("v", "id")
    ref = df.withColumn("rrank", F.row_number().over(w))
    assert mine.join(ref, ["id"]).filter(F.col("rank") != F.col("rrank")).count() == 0
    totals = {r["g"]: r["n_total"] for r in mine.select("g", "n_total").distinct().collect()}
    want = {r["g"]: r["cnt"] for r in df.groupBy("g").agg(F.count("*").alias("cnt")).collect()}
    assert totals == want


def test_ntile_fewer_rows_than_buckets(spark):
    """n < k: NTILE assigns bucket == rank (one row per leading bucket);
    the closed form must not trip on its empty-bucket division branch."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, float(i)) for i in range(3)], "id long, v double")
    got = sorted(
        (r["id"], r["d"])
        for r in bucketed_global_rank(df, ["v", "id"])
        .select("id", ntile_from_rank(F.col("rank"), F.col("n_total"), 10).alias("d"))
        .collect()
    )
    assert got == [(0, 1), (1, 2), (2, 3)]


@pytest.mark.parametrize("k", [3, 10])
def test_ntile_from_rank_matches_window_ntile(spark, k):
    df = _rand_df(spark, n=1009)
    mine = bucketed_global_rank(df, ["v", "id"], n_buckets=8).select(
        "id", ntile_from_rank(F.col("rank"), F.col("n_total"), k).alias("d")
    )
    ref = df.select("id", F.ntile(k).over(Window.orderBy("v", "id")).alias("rd"))
    assert mine.join(ref, "id").filter(F.col("d") != F.col("rd")).count() == 0


def test_exact_quantiles_matches_percentile(spark):
    df = _rand_df(spark).withColumn("g", (F.col("id") % 3).cast("int"))
    got = {
        (r["g"], r["qname"]): r["quantile"]
        for r in exact_quantiles(
            df, "v", {"p50": 0.5, "p90": 0.9, "p99": 0.99}, by=["g"]
        ).collect()
    }
    ref = df.groupBy("g").agg(
        *[F.percentile("v", p).alias(nm) for nm, p in
          [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]]
    )
    for r in ref.collect():
        for nm in ("p50", "p90", "p99"):
            assert got[(r["g"], nm)] == pytest.approx(r[nm], abs=1e-9)


def test_exact_quantiles_tiny_groups(spark):
    """n=1 and n=2 groups: interpolation degenerates correctly (h=1 ->
    the single value; p=0.5 over two values -> their midpoint)."""
    df = spark.createDataFrame(
        [("a", 42.0), ("b", 10.0), ("b", 20.0)], "g string, v double"
    )
    got = {
        (r["g"], r["qname"]): r["quantile"]
        for r in exact_quantiles(df, "v", {"p50": 0.5, "p99": 0.99}, by=["g"]).collect()
    }
    assert got[("a", "p50")] == 42.0 and got[("a", "p99")] == 42.0
    assert got[("b", "p50")] == pytest.approx(15.0)
    assert got[("b", "p99")] == pytest.approx(10.0 + 0.99 * 10.0)


def test_exact_quantiles_events_shape(spark):
    """Post-swap value pins on the shapes the r15 side-by-side run proved
    bit-identical (recorded in SCALE.md): the real events table, global
    and grouped, against Spark's own percentile_cont; plus the
    fewer-rows-than-buckets group whose exact answers are pinned as
    literals (these were the identity test's assertion values before the
    r16 body swap retired the two-consumer form)."""
    from prod_data_pipeline_spark.sources.readers import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    probs = {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    got_g = {
        (r["event_type"], r["qname"]): r["quantile"]
        for r in exact_quantiles(ev, "value", probs, by=["event_type"]).collect()
    }
    ref_g = ev.groupBy("event_type").agg(
        *[F.percentile("value", p).alias(nm) for nm, p in probs.items()]
    )
    for r in ref_g.collect():
        for nm in probs:
            assert got_g[(r["event_type"], nm)] == pytest.approx(r[nm], abs=1e-9)
    got = {r["qname"]: r["quantile"] for r in exact_quantiles(ev, "value", probs).collect()}
    ref = ev.agg(*[F.percentile("value", p).alias(nm) for nm, p in probs.items()]).first()
    for nm in probs:
        assert got[nm] == pytest.approx(ref[nm], abs=1e-9)
    # tiny group (fewer rows than buckets): ranks 1..3, h interpolation
    tiny = spark.createDataFrame(
        [("g", 1.0), ("g", 5.0), ("g", 9.0), ("h", 2.0)], ["g", "v"]
    )
    a = sorted(map(tuple, exact_quantiles(tiny, "v", {"p50": 0.5}, by=["g"]).collect()))
    assert a == [("g", "p50", 5.0), ("h", "p50", 2.0)]


def test_exact_quantiles_scan_count(spark):
    """The point of the r16 swap: the ranked relation is single-consumer,
    so one exact_quantiles call costs at most 4 source scans on the
    events shape (the pre-swap two-consumer body cost 8)."""
    from prod_data_pipeline_spark.sources.readers import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    probs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    q = exact_quantiles(ev, "value", probs, by=["event_type"])
    n = q._jdf.queryExecution().executedPlan().toString().count("Scan parquet")
    assert n <= 4, n
