"""Skew/bucketing join strategies: value-equivalence + the plan properties
that make them worth using (salt spreads a hot key; bucketed joins drop the
Exchange entirely)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod_data_pipeline_spark.operators.skew import salted_join, write_bucketed
from prod_data_pipeline_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    """Same rows out, inner and left, including a pathological hot key."""
    big = spark.range(2000).select(
        F.when(F.col("id") < 1500, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    for how in ("inner", "left"):
        plain = big.join(small, ["k"], how).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        salted = salted_join(big, small, "k", salt=8, how=how).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_rejects_outer_joins(spark):
    """Replicating the small side salt-ways would emit `salt` copies of each
    unmatched small-side row under right/full-outer semantics — reject."""
    import pytest

    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", how=how)


def test_salt_is_deterministic_across_reruns(spark):
    """xxhash64 salting (not rand()): identical output set on recompute —
    required for task retries / speculative execution."""
    big = spark.range(500).select((F.col("id") % 5).alias("k"), F.col("id").alias("p"))
    small = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
    j = salted_join(big, small, "k", salt=4)
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, j.collect()))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed 8-ways on the join key: the join plan contains
    NO Exchange (the write paid the shuffle once; every later join on the
    key is co-located)."""
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    try:
        write_bucketed(o, "b_orders", "o_custkey", num_buckets=8, sort_cols="o_custkey")
        write_bucketed(c, "b_customer", "c_custkey", num_buckets=8, sort_cols="c_custkey")
        bo, bc = spark.table("b_orders"), spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n")
        )
        # Disable broadcast so the bucketed SMJ path is what gets planned.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        join_part = plan.split("HashAggregate")[-1]  # below the agg: the join itself
        assert "Exchange" not in join_part, f"bucketed join still shuffles:\n{plan}"
        # and values match the unbucketed join
        expect = {
            tuple(r)
            for r in o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert {tuple(r) for r in joined.collect()} == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_zorder_value_interleave_bijection(spark):
    """Morton key invariants: the interleave is a bijection on the grid
    (distinct inputs -> distinct keys, and bits de-interleave back).
    write_zordered's file-span behavior is covered in test_sources."""
    from pyspark.sql import functions as F

    from prod_data_pipeline_spark.sources.writers import zorder_value

    df = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a long, b long"
    )
    rows = df.select(
        "a", "b", zorder_value([F.col("a"), F.col("b")], 4).alias("z")
    ).collect()
    assert len({r["z"] for r in rows}) == 256  # bijection on the 4-bit grid
    for r in rows:
        a = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(4))
        b = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(4))
        assert (a, b) == (r["a"], r["b"])  # de-interleaves exactly
    # known Morton values: (1,0)->1, (0,1)->2, (3,3)->15
    z = {(r["a"], r["b"]): r["z"] for r in rows}
    assert (z[(1, 0)], z[(0, 1)], z[(3, 3)]) == (1, 2, 15)
