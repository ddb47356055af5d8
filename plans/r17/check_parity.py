"""Oracle parity for the round-17 touched queries at sf0.01 + sf0.1.

    PYTHONPATH=/root/repo python plans/r17/check_parity.py [query ...]

Mirrors the driver's correctness gate via tests.parity.assert_frames_match.
"""
import sys
import traceback

from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.session import get_spark
from tests.parity import assert_frames_match, oracle_df

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
spark = get_spark(app_name="r17-parity")
spark.sparkContext.setLogLevel("ERROR")
failed = []
for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    for name in names:
        spec = QUERIES[name]
        try:
            mine = spec.fn(spark, sf_dir).toPandas()
            orc = oracle_df(spec.oracle, sf_dir)
            assert_frames_match(mine, orc, name)
            print(f"OK   {sf_dir.split('/')[-1]:7s} {name}", flush=True)
        except Exception:
            failed.append((sf_dir, name))
            print(f"FAIL {sf_dir.split('/')[-1]:7s} {name}", flush=True)
            traceback.print_exc()
spark.stop()
print("FAILED:", failed if failed else "none")
sys.exit(1 if failed else 0)
