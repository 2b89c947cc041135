"""Physical-plan anti-pattern sweep over every queries() entry.

The plan-shape tests in tests/test_plans.py pin specific properties on
specific queries; this tool is the broad net: it explains ALL queries
and flags the patterns that kill 100 TB runs regardless of which query
they appear in:

* ``CartesianProduct``       — unbucketed pair blowup (hard fail)
* ``BatchEvalPython``        — row-at-a-time Python in the plan (hard
                               fail; Arrow kernels show as MapInPandas /
                               PythonMapInArrow and are allowed)
* ``Exchange SinglePartition``— a global single-reducer stage.  One is
                               legitimate for scalar/tiny-summary aggs
                               (corpus totals, bucket-offset windows);
                               more than TWO in one query is reported.

Run:  python tools/plan_audit.py [sf_dir] [name_filter]
Exit: non-zero on any hard flag.
"""

from __future__ import annotations

import sys

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
from go_mapreduce_crawler_spark.operators import all_queries  # noqa: E402
from go_mapreduce_crawler_spark.plans import physical_plan  # noqa: E402

hard, soft, errored = [], [], []
for name, fn in all_queries().items():
    if name_filter and name_filter not in name:
        continue
    try:
        plan = physical_plan(fn(spark, sf_dir))
    except Exception as ex:
        errored.append(f"{name}: {type(ex).__name__}: {ex}"[:200])
        continue
    if "CartesianProduct" in plan:
        hard.append(f"{name}: CartesianProduct")
    if "BatchEvalPython" in plan:
        hard.append(f"{name}: row-at-a-time Python (BatchEvalPython)")
    n_single = plan.count("Exchange SinglePartition")
    if n_single > 2:
        soft.append(f"{name}: {n_single} single-partition exchanges")

print(f"hard={len(hard)} soft={len(soft)} errored={len(errored)}")
for h in hard:
    print("HARD", h)
for s in soft:
    print("soft", s)
for e in errored:
    print("err ", e)
sys.exit(1 if hard or errored else 0)
