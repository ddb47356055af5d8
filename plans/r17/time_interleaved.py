"""Interleaved base-vs-cut walls for the round-17 cuts whose sequential
before/after captures disagreed with the r16 proto numbers (noisy-box
check): rebuild the PRE-cut body inline (exact r16-close source minus the
cut) and alternate base/cut passes in ONE session, best-of-3 each.

    PYTHONPATH=/root/repo python plans/r17/time_interleaved.py
"""
import time

from pyspark.sql import functions as F

from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.plans.queries_events_star import _t
from prod_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def base_ivf(spark, sf_dir):
    from prod_data_pipeline_spark.operators.similarity import ivf_recall_at_k

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    per_query = ivf_recall_at_k(emb, queries_df, k=5, nprobe=4, n_cells=8)
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.lit(5).cast("long").alias("k"),
        F.sum("n_exact").cast("long").alias("n_exact_total"),
        F.lit(0.65).cast("double").alias("recall_floor"),
        (F.avg("recall") >= F.lit(0.65)).alias("avg_recall_ge_floor"),
    )


def base_clicks(spark, sf_dir):
    from prod_data_pipeline_spark.operators.joins import time_range_join

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select("event_id", "user_id", F.col("ts").alias("purchase_ts"))
    c = ev.filter(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select("user_id", "ts")
    pairs = time_range_join(
        p, c, by="user_id", left_ts="purchase_ts", right_ts="ts",
        lower_s=-600.0, upper_s=0.0,
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


def base_mi(spark, sf_dir):
    from prod_data_pipeline_spark.plans.queries_text_dedup import dsum

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        F.col("event_type").alias("x"),
        F.floor(F.col("value") / 25.0).cast("int").alias("y"),
    )
    nn = base.agg(F.count(F.lit(1)).cast("double").alias("n"))
    cxy = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    cx = base.groupBy("x").agg(F.count(F.lit(1)).alias("cx"))
    cy = base.groupBy("y").agg(F.count(F.lit(1)).alias("cy"))

    def dec_sum(col):
        return F.round(dsum(col, 9), 6)

    mi_terms = (
        cxy.join(F.broadcast(cx), "x").join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(nn))
        .select(F.round(
            (F.col("c").cast("double") / F.col("n"))
            * F.log(F.col("c").cast("double") * F.col("n")
                    / (F.col("cx").cast("double") * F.col("cy").cast("double"))), 9
        ).alias("term"))
    )
    hx = cx.crossJoin(F.broadcast(nn)).select(F.round(
        -(F.col("cx").cast("double") / F.col("n"))
        * F.log(F.col("cx").cast("double") / F.col("n")), 9).alias("term"))
    hy = cy.crossJoin(F.broadcast(nn)).select(F.round(
        -(F.col("cy").cast("double") / F.col("n"))
        * F.log(F.col("cy").cast("double") / F.col("n")), 9).alias("term"))
    n_cells = cxy.agg(F.count(F.lit(1)).alias("n_cells"))
    return (
        n_cells.crossJoin(F.broadcast(mi_terms.agg(dec_sum(F.col("term")).alias("mi_nats"))))
        .crossJoin(F.broadcast(hx.agg(dec_sum(F.col("term")).alias("h_type_nats"))))
        .crossJoin(F.broadcast(hy.agg(dec_sum(F.col("term")).alias("h_bucket_nats"))))
    )


def base_dsir(spark, sf_dir):
    from prod_data_pipeline_spark.operators.ranking import bucketed_global_rank
    from prod_data_pipeline_spark.operators.sampling import dsir_importance
    from prod_data_pipeline_spark.plans.queries_text_dedup import dsum

    docs = _t(spark, sf_dir, "documents")
    raw = docs.filter(F.col("lang") != "en")
    target = docs.filter(F.col("lang") == "en")
    w = dsir_importance(raw, target).withColumn("_negw", -F.col("log_w"))
    ranked = bucketed_global_rank(w, ["_negw", "doc_id"])
    sel = ranked.withColumn(
        "s", (F.col("rank") <= F.ceil(F.lit(0.2) * F.col("n_total"))).cast("int")
    )
    return (
        sel.join(raw.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("s").cast("bigint").alias("n_selected"),
            F.round(F.sum("s").cast("double") / F.count(F.lit(1)), 6).alias("sel_share"),
            F.round(dsum("log_w", 6) / F.count(F.lit(1)), 6).alias("avg_log_w"),
        )
        .orderBy("source")
    )


def base_bpe(spark, sf_dir):
    from prod_data_pipeline_spark.functions.text import tokens as _tokens

    docs = _t(spark, sf_dir, "documents")
    tsrc = (
        docs.select("source", F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tf = tsrc.groupBy("token").agg(F.sum("c").alias("c"))

    def pair_counts(src, col):
        return (
            src.filter(F.length(col) >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.length(col) - 1),
                        lambda i: F.substring(F.col(col), i, F.lit(2)),
                    )
                ).alias("pair"),
                "c",
            )
            .groupBy("pair")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )

    m1 = pair_counts(tf, "token").select(F.col("pair").alias("m1"))
    v1 = tf.crossJoin(F.broadcast(m1)).select(
        "token", F.replace(F.col("token"), F.col("m1"), F.lit("1")).alias("t1"), "c"
    )
    m2 = pair_counts(v1, "t1").select(F.col("pair").alias("m2"))
    vocab = v1.crossJoin(F.broadcast(m2)).select(
        "token",
        F.length("token").alias("len_b"),
        F.length(F.replace(F.col("t1"), F.col("m2"), F.lit("2"))).alias("len_a"),
    )
    return (
        tsrc.join(vocab, "token")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("len_b")).cast("long").alias("n_symbols_before"),
            F.sum(F.col("c") * F.col("len_a")).cast("long").alias("n_symbols_after"),
            F.round(
                F.sum(F.col("c") * F.col("len_a")).cast("double")
                / F.sum(F.col("c") * F.col("len_b")), 6
            ).alias("compression"),
        )
        .orderBy("source")
    )


PAIRS = [
    ("emb_ivf_recall", base_ivf),
    ("events_clicks_before_purchase", base_clicks),
    ("events_type_value_mi", base_mi),
    ("docs_dsir_selection", base_dsir),
    ("docs_bpe_encode_stats", base_bpe),
]

spark = get_spark(app_name="r17-interleave")
spark.sparkContext.setLogLevel("ERROR")
mat = lambda df: df.write.format("noop").mode("overwrite").save()
for name, base_fn in PAIRS:
    cut_fn = QUERIES[name].fn
    mat(base_fn(spark, SF))  # codegen warmup both variants
    mat(cut_fn(spark, SF))
    bts, cts = [], []
    for _ in range(3):  # interleave base/cut so drift hits both equally
        t0 = time.perf_counter(); mat(base_fn(spark, SF)); bts.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter(); mat(cut_fn(spark, SF)); cts.append(round(time.perf_counter() - t0, 3))
    print("INTERLEAVE", name, "base:", min(bts), bts, "cut:", min(cts), cts, flush=True)
spark.stop()
