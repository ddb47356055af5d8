"""Round-15 consolidation panels (prepared round 14, registered round 15):
pins the post-switch invariant — each panel is registered with its oracle
and BOTH of its source-pair members are de-registered (a half-switch fails
here).  Panel-vs-oracle parity now rides the registered sf0.001 sweep
(tests/test_queries_parity.py), the same harness that proved the panels
before the switch, so a duplicate parity run here would only re-pay the
trained-gate/IVF pipelines."""

from __future__ import annotations

from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.plans.queries_merged_panels import MERGED_PANELS


def test_switch_state():
    for name, (fn, sql, pair) in MERGED_PANELS.items():
        assert name in QUERIES, (
            f"{name} not registered — the r15 switch registers every panel"
        )
        assert QUERIES[name].fn is fn and QUERIES[name].oracle == sql, (
            f"{name}: registered spec diverged from the MERGED_PANELS payload"
        )
        for src in pair:
            assert src not in QUERIES, (
                f"{name}: source {src} still registered — the switch "
                "de-registers both pair members in the same commit"
            )
