import io, sys, time
from contextlib import redirect_stdout
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from prod_data_pipeline_spark.session import get_spark, truncate_lineage
from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.plans.queries_events_star import _t

def cut_variant(spark, sf_dir):
    from prod_data_pipeline_spark.operators.joins import time_range_join
    ev = _t(spark, sf_dir, "events")
    p = ev.filter((F.col("event_type") == "purchase") & F.col("user_id").isNotNull()).select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    ).transform(truncate_lineage, eager=False)             # CUT: slim purchases, 2 consumers
    c = ev.filter((F.col("event_type") == "click") & F.col("user_id").isNotNull()).select(
        "user_id", "ts"
    )
    pairs = time_range_join(
        p, c, by="user_id", left_ts="purchase_ts", right_ts="ts", lower_s=-600.0, upper_s=0.0
    )
    keys = ["event_id", "user_id", "purchase_ts"]
    counts = pairs.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return (
        p.select(*keys)
        .distinct()
        .join(counts, keys, "left")
        .select(*keys, F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_clicks_10m"))
        .orderBy(*keys)
    )

spark = get_spark(app_name="proto-clicks")
spark.sparkContext.setLogLevel("ERROR")
mat = lambda df: df.write.format("noop").mode("overwrite").save()
name = "events_clicks_before_purchase"
for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    reg = QUERIES[name].fn(spark, sf_dir).collect()
    cut = cut_variant(spark, sf_dir).collect()
    print(name, sf_dir, "identical:", reg == cut, flush=True)
for label, f in [("base", QUERIES[name].fn), ("cut", cut_variant)]:
    df = f(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    print(label, "scan nodes:", buf.getvalue().count("Location:"), flush=True)
    mat(f(spark, "/root/testdata/sf0.1"))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); mat(f(spark, "/root/testdata/sf0.1")); ts.append(round(time.perf_counter()-t0, 3))
    print(name, label, "best-of-3:", min(ts), ts, flush=True)
spark.stop()
