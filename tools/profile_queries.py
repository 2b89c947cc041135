"""Time every queries() entry (Spark side + DuckDB oracle side) at a
given SF — finds the per-query driver-budget hogs.

The driver's correctness pass at sf0.01 runs BOTH sides per query and
stopped at 50/118 in round 1 on budget; keeping every query in the
low-seconds band is what buys a correctness row for all of them.

Run:  python tools/profile_queries.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import sys
import time
import traceback

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

from tests.oracle_utils import duck_connection  # noqa: E402

con = duck_connection(sf_dir)
queries = entry.queries()
oracles = entry.oracle_sql()

rows = []
for name, fn in queries.items():
    if name_filter and name_filter not in name:
        continue
    t0 = time.monotonic()
    try:
        fn(spark, sf_dir).toPandas()
        t_spark = time.monotonic() - t0
    except Exception:
        print(f"ERR spark {name}")
        traceback.print_exc(limit=2)
        continue
    t_duck = 0.0
    sql = oracles.get(name)
    if sql is not None:
        t0 = time.monotonic()
        try:
            con.sql(sql).df()
            t_duck = time.monotonic() - t0
        except Exception:
            print(f"ERR duck {name}")
            traceback.print_exc(limit=2)
            continue
    rows.append((t_spark + t_duck, t_spark, t_duck, name))
    spark.catalog.clearCache()

rows.sort(reverse=True)
total = sum(r[0] for r in rows)
print(f"\n{'total':>7s} {'spark':>7s} {'duck':>7s}  query")
for tot, ts, td, name in rows:
    print(f"{tot:7.2f} {ts:7.2f} {td:7.2f}  {name}")
print(f"\nsum={total:.1f}s over {len(rows)} queries")
