#!/usr/bin/env python
"""Print the formatted physical plan for any registered query.

    python -m tools.explain q1_pricing_summary [sf_dir]
    python -m tools.explain --list
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prod_data_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from prod_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("--list", "-l"):
        for name, spec in sorted(QUERIES.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            star = "*" if spec.headline else " "
            print(f"{star} {name:32s} [{kind}] {','.join(spec.tags)}")
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    if name not in QUERIES:
        sys.exit(f"unknown query {name!r}; --list to enumerate")
    spark = get_spark(app_name=f"explain-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[name].fn(spark, sf_dir)
    df.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
