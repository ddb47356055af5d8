import io, sys, time
from contextlib import redirect_stdout
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from prod_data_pipeline_spark.session import get_spark, truncate_lineage
from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.plans.queries_events_star import _t

def cut_variant(spark, sf_dir):
    from prod_data_pipeline_spark.operators.similarity import ivf_recall_at_k
    emb = _t(spark, sf_dir, "embeddings").transform(truncate_lineage, eager=False)  # CUT
    queries_df = emb.filter(F.col("vec_id") < 8)
    per_query = ivf_recall_at_k(emb, queries_df, k=5, nprobe=4, n_cells=8)
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.lit(5).cast("long").alias("k"),
        F.sum("n_exact").cast("long").alias("n_exact_total"),
        F.lit(0.65).cast("double").alias("recall_floor"),
        (F.avg("recall") >= F.lit(0.65)).alias("avg_recall_ge_floor"),
    )

spark = get_spark(app_name="proto-ivf")
spark.sparkContext.setLogLevel("ERROR")
mat = lambda df: df.write.format("noop").mode("overwrite").save()
name = "emb_ivf_recall"
for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    reg = QUERIES[name].fn(spark, sf_dir).collect()
    cut = cut_variant(spark, sf_dir).collect()
    print(name, sf_dir, "identical:", reg == cut, "reg:", reg, flush=True)
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
