import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from prod_data_pipeline_spark.session import get_spark, truncate_lineage
from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.plans.queries_media_rank import _t

def cut_variant(spark, sf_dir):
    from prod_data_pipeline_spark.operators.ranking import bucketed_global_rank
    from prod_data_pipeline_spark.operators.sketches import (
        value_histogram_build, value_histogram_merge,
    )
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    r = ev.select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("vc")
    ).transform(truncate_lineage, eager=False)             # CUT: slim corpus relation
    sk = value_histogram_build(
        ev, "value", by=(F.to_date("ts").alias("day"),), n_buckets=64, vmax_cents=50_000
    ).transform(truncate_lineage, eager=True)              # CUT: tiny post-agg relation
    merged = value_histogram_merge(sk)
    w_all = Window.partitionBy(F.lit(0))
    w_run = w_all.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = merged.select(
        "bucket", F.sum("cnt").over(w_run).alias("cum"), F.sum("cnt").over(w_all).alias("n"),
    )
    qs = spark.createDataFrame([(25,), (50,), (75,), (90,)], "q100 int")
    est = (
        cum.crossJoin(F.broadcast(qs))
        .filter(100 * F.col("cum") >= F.col("q100") * F.col("n"))
        .groupBy("q100").agg(F.min("bucket").alias("b"))
    )
    ranked = bucketed_global_rank(r, order_cols=("vc", "event_id"))
    exact = (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.col("rank") == F.expr("(q100 * n_total + 99) div 100"))
        .select("q100", F.col("vc").alias("exact_vc"))
    )
    n_days = sk.select(F.countDistinct("day").alias("nd"))
    edge = F.col("b") + 1
    return (
        est.join(exact, "q100")
        .crossJoin(F.broadcast(n_days))
        .select(
            (F.col("q100").cast("double") / 100.0).alias("quantile"),
            F.round((edge * 50000).cast("double") / 64.0 / 100.0, 4).alias("sketch_value"),
            (F.col("exact_vc").cast("double") / 100.0).alias("exact_value"),
            F.round(F.abs((edge * 50000).cast("double") / 64.0 / 100.0
                          - F.col("exact_vc").cast("double") / 100.0), 4).alias("abs_err"),
            F.col("nd").cast("long").alias("n_day_sketches"),
        )
        .orderBy("quantile")
    )

spark = get_spark(app_name="proto-sketchq")
spark.sparkContext.setLogLevel("ERROR")
mat = lambda df: df.write.format("noop").mode("overwrite").save()
name = "events_value_sketch_quantiles"
for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    reg = QUERIES[name].fn(spark, sf_dir).collect()
    cut = cut_variant(spark, sf_dir).collect()
    print(name, sf_dir, "identical:", reg == cut, flush=True)
for label, f in [("base", QUERIES[name].fn), ("cut", cut_variant)]:
    mat(f(spark, "/root/testdata/sf0.1"))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); mat(f(spark, "/root/testdata/sf0.1")); ts.append(round(time.perf_counter()-t0, 3))
    print(name, label, "best-of-3:", min(ts), ts, flush=True)
spark.stop()
