"""sf1 spot-probe for the r08b EVENT-side ops: a 10x events fixture
(key-shifted replicas — the r06 recipe: event_id strided, user_id
shifted per replica so per-user series structure is preserved, ts
unchanged so the CALENDAR span is identical) measures the claims the
documents-based probes could not:

  - events_changepoint_cusum / events_markov_stationary: post-agg
    state is calendar/type-bounded, so 10x volume should cost only
    the count shuffle;
  - stream_sessionize_replay / stream_anomaly_scoring_replay /
    stream_trending_topk_replay: replay fixtures and per-batch work
    scale with events — expect roughly output-linear wall.

Run:  python tools/scale_probe_r08e.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1_r08e"
REPLICAS = 10
ID_STRIDE = 1_000_000_000
USER_STRIDE = 10_000_000

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "12g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

NAMES = [
    "events_changepoint_cusum",
    "events_markov_stationary",
    "stream_sessionize_replay",
    "stream_anomaly_scoring_replay",
    "stream_trending_topk_replay",
]


def build_sf1():
    os.makedirs(SF1, exist_ok=True)
    if os.path.exists(os.path.join(SF1, "events.parquet")):
        return
    ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    rep = ev.crossJoin(
        spark.range(REPLICAS).select(F.col("id").alias("rep")))
    out = rep.select(
        (F.col("event_id") + F.col("rep") * ID_STRIDE).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * USER_STRIDE).alias("user_id"),
        "event_type", "value", "props")
    out.repartition(8).write.parquet(os.path.join(SF1, "events.parquet"))


def main():
    build_sf1()
    from go_mapreduce_crawler_spark.operators import all_queries
    q = all_queries()
    out = {"note": "10x key-shifted event replicas, ts unchanged "
                   "(calendar span identical)", "results": {}}
    for tag, sf in (("sf0.1", SF01), ("sf1", SF1)):
        for name in NAMES:
            t0 = time.time()
            n = q[name](spark, sf).count()
            out["results"].setdefault(name, {})[tag] = {
                "rows": n, "sec": round(time.time() - t0, 2)}
            spark.catalog.clearCache()
    for name, r in out["results"].items():
        r["wall_ratio_10x"] = round(r["sf1"]["sec"]
                                    / max(r["sf0.1"]["sec"], 0.01), 2)
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "tools", "scale_probe_r08e.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v["wall_ratio_10x"]
                      for k, v in out["results"].items()}, indent=1))


if __name__ == "__main__":
    main()
