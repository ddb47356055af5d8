import io, sys, time
from contextlib import redirect_stdout
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from prod_data_pipeline_spark.session import get_spark, truncate_lineage
from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.plans.queries_text_dedup import _t, dsum

def heaps_cut(spark, sf_dir):
    from prod_data_pipeline_spark.functions.text import tokens as _tokens
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    grams_arr = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode(grams_arr).alias("gram"))
        .transform(truncate_lineage, eager=False)          # <-- CUT (corpus-slim)
    )
    firsts = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    percount = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    mx = docs.agg(F.max("doc_id").alias("m"))
    ks = mx.select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("k"), "m"
    ).select("k", F.expr("(m * k) div 10").alias("t")).transform(truncate_lineage, eager=True)  # <-- CUT (10 rows)
    v = (
        firsts.join(F.broadcast(ks))
        .filter(F.col("first_doc") <= F.col("t"))
        .groupBy("k").agg(F.count(F.lit(1)).alias("v"))
    )
    n = (
        percount.join(F.broadcast(ks))
        .filter(F.col("doc_id") <= F.col("t"))
        .groupBy("k").agg(F.sum("n_grams").alias("n"))
    )
    pts = ks.select("k").join(v, "k", "left").join(n, "k", "left").select(
        "k", F.coalesce("v", F.lit(0)).alias("v"), F.coalesce("n", F.lit(0)).alias("n"),
    ).transform(truncate_lineage, eager=True)              # <-- CUT (10 rows)
    xy = pts.filter((F.col("n") > 0) & (F.col("v") > 0)).select(
        F.round(F.log(F.col("n").cast("double")), 9).alias("x"),
        F.round(F.log(F.col("v").cast("double")), 9).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x", 9).alias("sx"), dsum("y", 9).alias("sy"),
        dsum(F.round(F.col("x") * F.col("y"), 9), 9).alias("sxy"),
        dsum(F.round(F.col("x") * F.col("x"), 9), 9).alias("sxx"),
    )
    fin = pts.filter(F.col("k") == 10).select(
        F.col("v").cast("long").alias("vocab_final"),
        F.col("n").cast("long").alias("grams_final"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        s.join(F.broadcast(fin))
        .select(
            F.col("n").cast("long").alias("n_checkpoints"),
            F.round(slope, 6).alias("heaps_beta"),
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
            "vocab_final", "grams_final",
        )
    )

def mi_cut(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        F.col("event_type").alias("x"),
        F.floor(F.col("value") / 25.0).cast("int").alias("y"),
    ).transform(truncate_lineage, eager=False)             # <-- CUT (slim corpus)
    nn = base.agg(F.count(F.lit(1)).cast("double").alias("n"))
    cxy = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    cx = base.groupBy("x").agg(F.count(F.lit(1)).alias("cx"))
    cy = base.groupBy("y").agg(F.count(F.lit(1)).alias("cy"))
    def dec_sum(col):
        return F.round(dsum(col, 9), 6)
    mi_terms = (
        cxy.join(F.broadcast(cx), "x").join(F.broadcast(cy), "y").crossJoin(F.broadcast(nn))
        .select(F.round(
            (F.col("c").cast("double") / F.col("n"))
            * F.log(F.col("c").cast("double") * F.col("n")
                    / (F.col("cx").cast("double") * F.col("cy").cast("double"))), 9).alias("term"))
    )
    hx_terms = cx.crossJoin(F.broadcast(nn)).select(
        F.round(-(F.col("cx").cast("double") / F.col("n"))
                * F.log(F.col("cx").cast("double") / F.col("n")), 9).alias("term"))
    hy_terms = cy.crossJoin(F.broadcast(nn)).select(
        F.round(-(F.col("cy").cast("double") / F.col("n"))
                * F.log(F.col("cy").cast("double") / F.col("n")), 9).alias("term"))
    n_cells = cxy.agg(F.count(F.lit(1)).alias("n_cells"))
    mi = mi_terms.agg(dec_sum(F.col("term")).alias("mi_nats"))
    hx = hx_terms.agg(dec_sum(F.col("term")).alias("h_type_nats"))
    hy = hy_terms.agg(dec_sum(F.col("term")).alias("h_bucket_nats"))
    return (
        n_cells.crossJoin(F.broadcast(mi)).crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    )

spark = get_spark(app_name="proto-heaps-mi")
spark.sparkContext.setLogLevel("ERROR")
mat = lambda df: df.write.format("noop").mode("overwrite").save()

for name, fn in [("docs_heaps_law_fit", heaps_cut), ("events_type_value_mi", mi_cut)]:
    for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        reg = QUERIES[name].fn(spark, sf_dir).collect()
        cut = fn(spark, sf_dir).collect()
        print(name, sf_dir, "identical:", reg == cut, flush=True)
    # timings at sf0.1, warm + best-of-3 each
    for label, f in [("base", QUERIES[name].fn), ("cut", fn)]:
        mat(f(spark, "/root/testdata/sf0.1"))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); mat(f(spark, "/root/testdata/sf0.1")); ts.append(round(time.perf_counter()-t0, 3))
        print(name, label, "best-of-3:", min(ts), ts, flush=True)
spark.stop()
