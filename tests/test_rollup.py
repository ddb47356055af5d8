"""Incremental rollup: equals full recompute, idempotent per partition,
and stays correct through reruns and late-data backfills."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod_data_pipeline_spark.plans.pipeline import backfill, curate
from prod_data_pipeline_spark.plans.rollup import full_rollup, update_daily_rollup
from tests.eventgen import generate_raw_events

DATES = ["2025-01-01", "2025-01-02", "2025-01-03"]


def _rows(df):
    """Order/type-normalized row set (partition col moves and re-types on
    read-back)."""
    df = df.withColumn("ingestion_date", F.col("ingestion_date").cast("string"))
    return {tuple(r) for r in df.select(*sorted(df.columns)).collect()}


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    raw, cur, roll, met = (str(tmp_path / p) for p in ("raw", "cur", "roll", "met"))
    generate_raw_events(raw, DATES, rows_per_day=150, dup_rate=0.01)
    backfill(spark, raw, DATES[0], DATES[2], cur, met)
    for d in DATES:
        update_daily_rollup(spark, cur, roll, d)
    got = _rows(spark.read.parquet(roll))  # materialize: files change below
    assert got == _rows(full_rollup(spark, cur))

    # rerun one date: rollup unchanged (idempotent)
    curate(spark, raw, DATES[1], cur, met)
    update_daily_rollup(spark, cur, roll, DATES[1])
    assert _rows(spark.read.parquet(roll)) == got

    # late data lands for one date -> only that partition's rollup changes
    generate_raw_events(raw, [DATES[1]], rows_per_day=180, dup_rate=0.0)
    curate(spark, raw, DATES[1], cur, met)
    update_daily_rollup(spark, cur, roll, DATES[1])
    updated = _rows(spark.read.parquet(roll))
    assert updated == _rows(full_rollup(spark, cur))
    # rows are (..., ingestion_date) sorted-column tuples; date is index 1
    date_idx = sorted(["ingestion_date", "event_type", "n_events", "n_users",
                       "sum_amount", "max_event_ts"]).index("ingestion_date")
    changed_days = {t[date_idx] for t in updated - got}
    assert changed_days == {DATES[1]}
