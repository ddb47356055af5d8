"""asof_join semantics: backward match, equal-ts inclusion, no-match null,
tiebreak determinism, and the no-blowup plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from prod_data_pipeline_spark.operators.joins import asof_join, time_range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic_backward_match(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2025-01-01T10:00:00")), (2, "u1", _ts("2025-01-01T12:00:00"))],
        ["id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", _ts("2025-01-01T09:00:00"), "a"), ("u1", _ts("2025-01-01T11:00:00"), "b")],
        ["user", "ts", "v"],
    )
    out = {
        r["id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, by="user", value_cols=["v"]).collect()
    }
    assert out[1] == (_ts("2025-01-01T09:00:00"), "a")
    assert out[2] == (_ts("2025-01-01T11:00:00"), "b")


def test_asof_equal_ts_matches_and_missing_is_null(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2025-01-01T09:00:00")), (2, "u2", _ts("2025-01-01T09:00:00"))],
        ["id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", _ts("2025-01-01T09:00:00"), "same-instant")], ["user", "ts", "v"]
    )
    out = {r["id"]: r["asof_v"] for r in asof_join(left, right, by="user", value_cols=["v"]).collect()}
    assert out[1] == "same-instant"  # right rows sort before left at equal ts
    assert out[2] is None  # no right row for u2 at all


def test_asof_tiebreak_picks_greatest(spark):
    left = spark.createDataFrame([(1, "u1", _ts("2025-01-01T10:00:00"))], ["id", "user", "ts"])
    right = spark.createDataFrame(
        [("u1", _ts("2025-01-01T09:00:00"), 1, "lo"), ("u1", _ts("2025-01-01T09:00:00"), 2, "hi")],
        ["user", "ts", "k", "v"],
    )
    rows = asof_join(
        left, right, by="user", value_cols=["v"], tiebreak_cols=["k"]
    ).collect()
    assert rows[0]["asof_v"] == "hi"


def test_time_range_join_matches_bruteforce(spark):
    """Binned equi-join must produce exactly the pairs a naive range
    predicate produces — including boundary-inclusive matches and pairs
    that straddle a bin edge."""
    left = spark.range(40).select(
        F.col("id").alias("lid"),
        (F.col("id") % 4).alias("user"),
        F.timestamp_micros(F.col("id") * 37_000_000).alias("ts"),  # 37 s apart
    )
    right = spark.range(60).select(
        (F.col("id") % 4).alias("user"),
        F.timestamp_micros(F.col("id") * 23_000_000).alias("ts"),
    )
    got = {
        (r["lid"], r["r_ts"])
        for r in time_range_join(
            left, right, by="user", lower_s=-100.0, upper_s=50.0
        ).collect()
    }
    naive = {
        (r["lid"], r["rts"])
        for r in left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.user") == F.col("r.user"))
            & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 100 SECOND"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 50 SECOND")),
        )
        .select(F.col("l.lid").alias("lid"), F.col("r.ts").alias("rts"))
        .collect()
    }
    assert got == naive and len(got) > 0


def test_asof_no_pair_blowup_in_plan(spark):
    """The plan must be union + window — a single shuffle on the key, no
    join operator at all (a range join would explode per-key)."""
    left = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("user"), F.timestamp_micros(F.col("id") * 1000).alias("ts")
    )
    right = spark.range(10).select(
        (F.col("id") % 3).alias("user"), F.timestamp_micros(F.col("id") * 500).alias("ts")
    )
    plan = asof_join(left, right, by="user")._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin", "HashJoin"):
        assert bad not in plan, f"asof_join plan regressed to {bad}"
    assert "Window" in plan
