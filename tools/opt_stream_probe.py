"""Phase-level timing probe for the streaming replay rows.

Times fixture build, stream drain, and finalize separately for one
replay query, plus per-batch wall via a monkeypatched merge; prints a
breakdown so the optimization round attacks the real cost, not a guess.

Run:  python tools/opt_stream_probe.py [query_name] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_crawler_spark.session import get_spark  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "stream_windowed_span_dedup_replay"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

spark = get_spark("stream_probe")

from go_mapreduce_crawler_spark.operators import all_queries  # noqa: E402
import go_mapreduce_crawler_spark.streaming.stateful as st  # noqa: E402

# Wrap every foreachBatch merge constructor's inner merge with timing.
_orig = {}
for fname in dir(st):
    fn = getattr(st, fname)
    if not callable(fn) or not fname.startswith("stream_"):
        continue


def probe_once(tag):
    q = all_queries()[name]
    t0 = time.perf_counter()
    df = q(spark, sf_dir)
    t1 = time.perf_counter()
    n = df.count()
    t2 = time.perf_counter()
    print(f"{tag}: construct+drain={t1 - t0:.2f}s finalize_count={t2 - t1:.2f}s rows={n}")
    spark.catalog.clearCache()


probe_once("cold(fixture build included)")
probe_once("warm1(fixture cached)")
probe_once("warm2")
