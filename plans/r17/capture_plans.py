"""Capture explain("formatted") for the round-17 touched queries.

    PYTHONPATH=<repo-or-worktree> python plans/r17/capture_plans.py <suffix> <outdir>

Writes <outdir>/<query>_<suffix>.txt at sf0.01 with the repo's tuned
session — same capture conditions as plans/r16 (see plans/r16/README.md).
"""
import io
import sys
from contextlib import redirect_stdout

from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.session import get_spark

TOUCHED = [
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

suffix, outdir = sys.argv[1], sys.argv[2]
if len(sys.argv) > 3:
    TOUCHED = sys.argv[3:]
spark = get_spark(app_name=f"capture-plans-{suffix}")
spark.sparkContext.setLogLevel("ERROR")
for name in TOUCHED:
    df = QUERIES[name].fn(spark, "/root/testdata/sf0.01")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    with open(f"{outdir}/{name}_{suffix}.txt", "w") as f:
        f.write(text)
    print(name, suffix, "scan nodes:", text.count("Location:"), flush=True)
spark.stop()
