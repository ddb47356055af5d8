"""Regenerate the all-227 formatted-plan dump + scan census (round 17).

    PYTHONPATH=/root/repo python plans/r17/make_census.py

Writes plans/r17/all227/<query>.txt (explain("formatted") at sf0.001 —
the census SF; plan SHAPE is what matters) and plans/r17/scan_census.tsv
with per-table scan-node counts from the `Location:` detail lines (one
per scan node — the reliable count; the operator tree re-prints shared
scans under each subquery section).  Same methodology/caveats as
plans/r16 (see its README): counts are static pre-AQE plan nodes, and
lineage-cut queries under-report because the cut relation's upstream
scan lives in the materialization pass inside the same invocation.
"""
import io
import os
import re
from contextlib import redirect_stdout

from prod_data_pipeline_spark.plans.queries import QUERIES
from prod_data_pipeline_spark.session import get_spark

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "all227")
os.makedirs(OUT, exist_ok=True)
spark = get_spark(app_name="r17-census")
spark.sparkContext.setLogLevel("ERROR")

rows = []
for name, spec in QUERIES.items():
    df = spec.fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
        f.write(text)
    tables = re.findall(r"Location:.*?/([a-z_]+)\.parquet", text)
    per = {}
    for t in tables:
        per[t] = per.get(t, 0) + 1
    total = sum(per.values())
    mx = max(per.values()) if per else 0
    detail = ",".join(f"{t}:{c}" for t, c in sorted(per.items(), key=lambda kv: -kv[1])) or "-"
    rows.append((name, total, mx, detail))
    print(name, total, mx, flush=True)

rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
tsv = os.path.join(os.path.dirname(OUT), "scan_census.tsv")
with open(tsv, "w") as f:
    f.write("query\tscan_nodes_total\tmax_per_table\tper_table\n")
    for r in rows:
        f.write("\t".join(str(x) for x in r) + "\n")
print("wrote", tsv)
spark.stop()
