"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This mirrors the driver's t2 correctness gate (run at sf0.01); sf0.001 keeps
the suite fast while exercising identical semantics.
"""

from __future__ import annotations

import pytest

from prod_data_pipeline_spark.plans.queries import QUERIES
from tests.conftest import SF_DIR
from tests.parity import check_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    check_query(spark, name, SF_DIR)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
