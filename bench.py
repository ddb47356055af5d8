#!/usr/bin/env python
"""Benchmark the headline queries; print ONE JSON line for the driver.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_RUNS (default 1).

Each query is materialized through the `noop` sink so we time the full
plan execution (scan -> shuffle -> agg) without driver-collect overhead;
a warmup query amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Best-of-2 by default: the first execution of each query pays one-off
    # whole-stage-codegen compilation (~0.5-1 s locally) that a cluster
    # amortizes over minutes of runtime; best-of-N reports steady state.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [name for name, spec in QUERIES.items() if spec.headline]
    # Warmup: run the cheapest headline once to pay JVM/codegen startup.
    materialize(QUERIES["events_per_day"].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in headline:
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            materialize(QUERIES[name].fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
