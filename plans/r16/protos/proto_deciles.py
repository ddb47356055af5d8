import io, sys, time
from contextlib import redirect_stdout
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from prod_data_pipeline_spark.session import get_spark, truncate_lineage
from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.plans.queries_text_dedup import _t, dsum
from prod_data_pipeline_spark.operators.ranking import bucketed_global_rank, ntile_from_rank

def variant(spark, sf_dir, cut):
    orders = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    if cut:
        orders = orders.transform(truncate_lineage, eager=False)
    ranked = bucketed_global_rank(orders, ["o_totalprice", "o_orderkey"])
    return (
        ranked.select(
            "o_totalprice",
            ntile_from_rank(F.col("rank"), F.col("n_total"), 10).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            dsum("o_totalprice").alias("total"),
        )
        .orderBy("decile")
    )

spark = get_spark(app_name="proto-deciles")
spark.sparkContext.setLogLevel("ERROR")
mat = lambda df: df.write.format("noop").mode("overwrite").save()

for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    base = variant(spark, sf_dir, cut=False).collect()
    cutv = variant(spark, sf_dir, cut=True).collect()
    reg  = QUERIES["orders_price_deciles"].fn(spark, sf_dir).collect()
    print(sf_dir, "identical(base,cut):", base == cutv, "identical(reg,cut):", reg == cutv, flush=True)

# scan counts (static plan)
for cut in (False, True):
    df = variant(spark, "/root/testdata/sf0.001", cut)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    print("cut" if cut else "base", "scan nodes:", buf.getvalue().count("Location:"), flush=True)

# timing at the inflated shape (warm first, then best-of-3 each)
inf = "/tmp/spark_graft_bench_sf0.1x10_v3"
for cut in (False, True):
    mat(variant(spark, inf, cut))  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); mat(variant(spark, inf, cut)); ts.append(round(time.perf_counter()-t0, 3))
    print("cut" if cut else "base", "inflated best-of-3:", min(ts), ts, flush=True)
spark.stop()
