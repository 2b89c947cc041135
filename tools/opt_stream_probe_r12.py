"""r12 phase-level probe for the streaming replay rows (guide §1/§7).

Two modes:

* ``ssjoin``: runs the stream-stream interval join replay with the
  query object held open, then dumps per-micro-batch ``durationMs``
  components (addBatch / getBatch / walCommit / commitOffsets /
  queryPlanning / triggerExecution) and state-operator metrics
  (rows total / updated / state memory / commit times) from
  ``recentProgress`` — the measurement r11's verdict item 1 asked for
  before touching state-store configs.

* ``jobs <query_name>``: runs any replay query under a job-group and
  prints per-job wall times from the UI REST API, so the per-batch
  side-effect jobs (verdict write, meta, postings, snapshot merge)
  are individually attributable.

Run:  python tools/opt_stream_probe_r12.py ssjoin [sf_dir] [--conf k=v ...]
      python tools/opt_stream_probe_r12.py jobs <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_crawler_spark.session import get_spark  # noqa: E402

args = sys.argv[1:]
mode = args[0] if args else "ssjoin"
rest = args[1:]
pos = [a for a in rest if not a.startswith("--")
       and "=" not in a]            # positional (non --conf k=v) args
if mode == "jobs":
    sf_dir = pos[1] if len(pos) > 1 else "/root/testdata/sf0.1"
else:
    sf_dir = pos[0] if pos else "/root/testdata/sf0.1"
extra = {}
for i, a in enumerate(rest):
    if a == "--conf":
        k, v = rest[i + 1].split("=", 1)
        extra[k] = v

extra.setdefault("spark.ui.enabled", "true")
extra.setdefault("spark.ui.port", "4056")
spark = get_spark("stream_probe_r12", extra_conf=extra)
sc = spark.sparkContext


def _rest(path):
    url = (f"http://localhost:4056/api/v1/applications/"
           f"{sc.applicationId}{path}")
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def ssjoin_probe():
    from pyspark.sql import functions as F

    from go_mapreduce_crawler_spark.operators.streaming_replay import (
        _MEM_SINK_SEQ, SSJOIN_WATERMARK, SSJOIN_WINDOW_H, _await_drained,
        _replay_ordered_events)

    for rep in range(3):
        stream = _replay_ordered_events(spark, sf_dir, "ssjoin")
        p = (stream.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("p_id"), "user_id",
                     F.col("ts").alias("p_ts"))
             .withWatermark("p_ts", SSJOIN_WATERMARK))
        v = (stream.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("v_id"),
                     F.col("user_id").alias("v_user"),
                     F.col("ts").alias("v_ts"))
             .withWatermark("v_ts", SSJOIN_WATERMARK))
        joined = p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts")
               - F.expr(f"INTERVAL {SSJOIN_WINDOW_H} HOURS")),
            "inner")
        out = joined.select(
            "p_id", "v_id", "user_id",
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"))
        _MEM_SINK_SEQ[0] += 1
        name = f"probe_ssjoin_{_MEM_SINK_SEQ[0]}"
        t0 = time.perf_counter()
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        _await_drained(q, "probe")
        wall = time.perf_counter() - t0
        n = spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0]
        print(f"\n=== rep {rep}: drain wall {wall:.2f}s rows={n} "
              f"batches={len(q.recentProgress)}")
        for pr in q.recentProgress:
            d = pr["durationMs"]
            so = pr.get("stateOperators") or []
            sm = {}
            if so:
                s = so[0]
                sm = {k: s.get(k) for k in
                      ("numRowsTotal", "numRowsUpdated", "allUpdatesTimeMs",
                       "commitTimeMs", "stateMemory",
                       "numStateStoreInstances")}
                sm["memoryUsedBytes"] = s.get("memoryUsedBytes")
            print(f"  batch {pr['batchId']}: rows_in={pr['numInputRows']} "
                  f"durationMs={d} state={sm}")
        spark.catalog.clearCache()


def jobs_probe(qname):
    from go_mapreduce_crawler_spark.operators import all_queries

    q = all_queries()[qname]
    q(spark, sf_dir).count()          # warm/fixture pass
    spark.catalog.clearCache()
    # foreachBatch / streaming-thread jobs don't inherit the job group;
    # attribute by job-id range instead (nothing else runs).
    last_id = max((j["jobId"] for j in _rest("/jobs")), default=-1)
    t0 = time.perf_counter()
    q(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    jobs = [j for j in _rest("/jobs") if j["jobId"] > last_id]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"\n=== {qname}: wall {wall:.2f}s, {len(jobs)} jobs")
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

    tot = 0.0
    for j in jobs:
        dur = (ts(j["completionTime"]) - ts(j["submissionTime"])
               ).total_seconds()
        tot += dur
        desc = (j.get("description") or "").splitlines()
        desc = desc[-1][:70] if desc else ""
        print(f"  job {j['jobId']}: {dur:6.3f}s tasks={j['numTasks']} "
              f"desc={desc}")
    print(f"  sum of job walls: {tot:.2f}s (gaps = driver time: "
          f"{wall - tot:.2f}s)")


if mode == "ssjoin":
    ssjoin_probe()
elif mode == "jobs":
    jobs_probe(rest[0])
else:
    raise SystemExit(f"unknown mode {mode}")
