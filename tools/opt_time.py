"""Per-query timing harness for the r11 optimization round.

Times NAMED queries() entries with bench.py's exact methodology (same
get_spark session shape, sf0.001 warm-up pass, best-of-3 count(),
clearCache between queries) so single-query before/after numbers are
directly comparable to bench_*.json entries without paying the
~25-minute full-bench run per iteration.

Run:  python tools/opt_time.py name1 name2 ... [--sf SF_DIR] [--reps N]
      python tools/opt_time.py --json out.json name1 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_crawler_spark.session import get_spark  # noqa: E402
from go_mapreduce_crawler_spark.operators import all_queries  # noqa: E402

names: list[str] = []
sf_dir = "/root/testdata/sf0.1"
reps = 3
out_json = None
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a == "--sf":
        i += 1
        sf_dir = argv[i]
    elif a == "--reps":
        i += 1
        reps = int(argv[i])
    elif a == "--json":
        i += 1
        out_json = argv[i]
    else:
        names.append(a)
    i += 1

spark = get_spark("opt_time")
queries = all_queries()

warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
if not os.path.isdir(warm_dir):
    warm_dir = sf_dir

timings: dict[str, float] = {}
for name in names:
    if name not in queries:
        print(f"{name}: NOT IN queries()")
        continue
    try:
        queries[name](spark, warm_dir).count()
    except Exception as ex:
        print(f"{name}: warmup error {type(ex).__name__}: {ex}")
    spark.catalog.clearCache()
    best = float("inf")
    runs = []
    try:
        for _ in range(reps):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
    except Exception as ex:
        print(f"{name}: ERROR {type(ex).__name__}: {ex}")
        spark.catalog.clearCache()
        continue
    spark.catalog.clearCache()
    timings[name] = round(best, 3)
    print(f"{name}: best={best:.3f}s  runs={runs}")

if out_json:
    with open(out_json, "w") as fh:
        json.dump({"sf_dir": sf_dir, "reps": reps, "queries": timings}, fh,
                  indent=1, sort_keys=True)
        fh.write("\n")
