"""Best-of-3 noop-sink wall timing at sf0.1 for the round-17 touched
queries (guide §1.4): one warmup pass pays codegen, then 3 timed passes.

    PYTHONPATH=<repo-or-worktree> python plans/r17/time_queries.py [query ...]
"""
import sys
import time

from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.session import get_spark

DEFAULT = [
    "emb_ivf_recall",
    "events_clicks_before_purchase",
    "orders_price_deciles",
    "docs_heaps_law_fit",
    "events_type_value_mi",
    "events_value_sketch_quantiles",
    "docs_bigram_logprob",
    "docs_unigram_logprob",
    "events_hll_users_panel",
    "docs_dsir_selection",
    "docs_collocations_pmi",
    "docs_bpe_encode_stats",
]

names = sys.argv[1:] or DEFAULT
sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="r17-timing")
spark.sparkContext.setLogLevel("ERROR")
mat = lambda df: df.write.format("noop").mode("overwrite").save()
for name in names:
    spark.sparkContext.setJobDescription(f"r17-timing: {name}")
    mat(QUERIES[name].fn(spark, sf_dir))  # codegen warmup
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        mat(QUERIES[name].fn(spark, sf_dir))
        ts.append(round(time.perf_counter() - t0, 3))
    print("TIME", name, "best-of-3:", min(ts), ts, flush=True)
spark.sparkContext.setJobDescription(None)
spark.stop()
