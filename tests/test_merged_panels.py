"""Round-15 consolidation panels (prepared round 14, unregistered): each
merged query must hash-match its oracle with the SAME parity harness the
registered sweep uses, so the r15 registration switch is a rename, not a
correctness event.  Also pins the switch preconditions: the panels are NOT
yet registered, and every source-pair member still is (de-registering
mid-round-14 would orphan the r9-refresh driver rows)."""

from __future__ import annotations

import pytest

from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.plans.queries_merged_panels import MERGED_PANELS
from tests.parity import assert_frames_match, oracle_df

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(MERGED_PANELS))
def test_panel_matches_oracle(spark, name):
    fn, sql, _pair = MERGED_PANELS[name]
    assert_frames_match(fn(spark, SF_DIR).toPandas(), oracle_df(sql, SF_DIR), name)


def test_switch_preconditions():
    for name, (_fn, _sql, pair) in MERGED_PANELS.items():
        assert name not in QUERIES, (
            f"{name} registered early — the r15 switch plan de-registers "
            "its pair in the same commit (SCALE.md)"
        )
        for src in pair:
            assert src in QUERIES, f"{name}: source {src} de-registered early"
