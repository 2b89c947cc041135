"""Spot-check named queries() entries against their DuckDB oracles.

Run:  python tools/check_queries.py name1 name2 ... [--sf SF_DIR]
Driver-mirror compare (count, schema, value hash) at sf0.01 by default.
"""

from __future__ import annotations

import os
import sys
import time

args: list[str] = []
sf_dir = "/root/testdata/sf0.01"
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a == "--sf":           # space-separated form
        i += 1
        sf_dir = argv[i]
    elif a.startswith("--sf="):
        sf_dir = a.split("=", 1)[1]
    else:
        args.append(a)
    i += 1

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_utils import compare, duck_connection  # noqa: E402

queries = entrymod.queries()
oracles = entrymod.oracle_sql()
con = duck_connection(sf_dir)

bad = 0
for name in args:
    if name not in queries:
        print(f"{name}: NOT IN queries()")
        bad += 1
        continue
    t0 = time.time()
    try:
        if name in oracles:
            problems = compare(queries[name](spark, sf_dir), con,
                               oracles[name], name)
            status = "MATCH" if not problems else f"MISMATCH {problems}"
        else:
            n = queries[name](spark, sf_dir).count()
            status = f"rows-only ({n} rows)"
    except Exception as exc:  # noqa: BLE001
        status = f"ERROR {type(exc).__name__}: {exc}"
    if "MATCH" != status.split()[0] and not status.startswith("rows-only"):
        bad += 1
    print(f"{name}: {status}  [{time.time() - t0:.1f}s]")

sys.exit(1 if bad else 0)
