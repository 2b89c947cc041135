"""Audit every (queries(), oracle_sql()) pair for driver-hash hazards.

The driver's canonicalizer is dtype-sensitive (int64 2 vs float64 2.0
hash differently) and cannot hash list cells.  The repo's own comparator
(tests/oracle_utils.py) canonicalizes those away, so this audit compares
the raw pandas frames the driver sees:

  * per-column pandas dtype mismatch between Spark toPandas() and
    DuckDB .df()  (classic cause: DuckDB SUM(int) -> HUGEINT -> float64)
  * object columns containing list/ndarray cells (unhashable)

Run:  python tools/audit_oracle_dtypes.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import sys
import traceback

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

from tests.oracle_utils import duck_connection  # noqa: E402

con = duck_connection(sf_dir)
queries = entry.queries()
oracles = entry.oracle_sql()

flagged: list[str] = []
errored: list[str] = []
ok = 0

for name, fn in queries.items():
    if name_filter and name_filter not in name:
        continue
    sql = oracles.get(name)
    if sql is None:
        continue
    try:
        s_pdf = fn(spark, sf_dir).toPandas()
        d_pdf = con.sql(sql).df()
    except Exception:
        errored.append(name)
        print(f"ERR  {name}")
        traceback.print_exc(limit=3)
        continue
    probs = []
    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        probs.append(f"columns spark={s_cols} duck={d_cols}")
    else:
        for c in s_cols:
            sd, dd = str(s_pdf[c].dtype), str(d_pdf[c].dtype)
            # int32 vs int64 proved benign for the driver's hash
            # (CORRECTNESS_r01: q7/q8/q9/windows all hashed true); the
            # hazardous classes are int-vs-float and datetime units.
            def _kind(t):
                if t.startswith(("int", "uint")):
                    return "int"
                if t.startswith("float"):
                    return "float"
                return t
            if _kind(sd) != _kind(dd):
                probs.append(f"col {c!r}: spark dtype={sd} duck dtype={dd}")
            for side, pdf in (("spark", s_pdf), ("duck", d_pdf)):
                col = pdf[c]
                if col.dtype == object and len(col) > 0:
                    nn = col.dropna()
                    if len(nn) and isinstance(nn.iloc[0], (list, tuple)) or \
                       len(nn) and type(nn.iloc[0]).__name__ == "ndarray":
                        probs.append(f"col {c!r} ({side}): list-valued cells")
    if probs:
        flagged.append(name)
        print(f"FLAG {name}")
        for p in probs:
            print(f"     {p}")
    else:
        ok += 1

print(f"\nok={ok} flagged={len(flagged)} errored={len(errored)}")
print("flagged:", flagged)
print("errored:", errored)
