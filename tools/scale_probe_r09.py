"""sf1 probe for the foreachBatch STREAMING REPLAY family (r08 verdict
item 7) — the one r08b family with no 10x evidence.  Replays a 10x
events/documents fixture through the three state patterns and records
PER-BATCH wall (from the query's own progress events) and STATE BYTES
(final snapshot on disk), converting the bounded-state claims
(stateful.py: mv state ~ |event_type| keys; span/minhash postings
pruned to the trailing SPAN_WIN_DOCS window) into measurements:

  - stream_mv_refresh: state bytes should be FLAT at 10x (5 event
    types either way); per-batch wall grows with batch size only.
  - stream_windowed_span_dedup / stream_windowed_minhash_dedup: the
    final posting snapshot is bounded by the trailing W-doc window —
    flat at 10x — while the append-only verdict log grows linearly
    with the stream (by design: one verdict row per doc).

Fixture recipe: key-shifted replicas (the r06/r08e recipe) — events
get event_id strided / user_id shifted / ts unchanged; documents get
doc_id strided 1e6 apart so each replica is an independent id range
(the trailing window never spans replicas — same per-doc semantics,
10x the stream).

Run:  python tools/scale_probe_r09.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1_r09"
REPLICAS = 10
ID_STRIDE = 1_000_000_000
USER_STRIDE = 10_000_000
DOC_STRIDE = 1_000_000

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "12g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")


def build_sf1():
    os.makedirs(SF1, exist_ok=True)
    if not os.path.exists(os.path.join(SF1, "events.parquet")):
        ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
        rep = ev.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("rep")))
        (rep.select(
            (F.col("event_id") + F.col("rep") * ID_STRIDE)
            .alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * USER_STRIDE)
            .alias("user_id"),
            "event_type", "value", "props")
         .repartition(8)
         .write.parquet(os.path.join(SF1, "events.parquet")))
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        d = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
        rep = d.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("rep")))
        (rep.select(
            (F.col("doc_id") + F.col("rep") * DOC_STRIDE).alias("doc_id"),
            "text", "lang", "source", "n_chars")
         .repartition(8)
         .write.parquet(os.path.join(SF1, "documents.parquet")))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _batch_walls(q) -> dict:
    out = {}
    for p in q.recentProgress:
        try:
            out[int(p["batchId"])] = int(
                p["durationMs"]["triggerExecution"])
        except (KeyError, TypeError, ValueError):
            pass
    return out


def _probe(sf_dir: str):
    """Run the three replays via the internal functions so the probe
    holds the StreamingQuery (per-batch progress) and the state dir."""
    import glob

    from go_mapreduce_crawler_spark.operators import streaming_replay as sr
    from go_mapreduce_crawler_spark.streaming.stateful import (
        stream_mv_refresh, stream_windowed_minhash_dedup,
        stream_windowed_span_dedup, windowed_minhash_dedup_finalize,
        windowed_span_dedup_finalize)

    res = {}

    def record(name, q, t0, state, finalize):
        sr._await_drained(q, name)
        rows = finalize().count()
        wall = round(time.time() - t0, 2)
        versions = sorted(glob.glob(f"{state}/state_v*"))
        res[name] = {
            "rows": rows, "wall_sec": wall,
            "batch_wall_ms": _batch_walls(q),
            "final_snapshot_bytes": _du(versions[-1]) if versions else 0,
            "verdict_log_bytes": sum(
                _du(p) for p in glob.glob(f"{state}/verdicts_b*")),
        }
        spark.catalog.clearCache()

    t0 = time.time()
    _, stream, state, ckpt = sr._replay(spark, sf_dir, "probe_mv")
    record("stream_mv_refresh", stream_mv_refresh(stream, state, ckpt),
           t0, state,
           lambda: sr.read_mv_state(spark, state))

    t0 = time.time()
    stream, state, ckpt = sr._replay_ordered_docs(spark, sf_dir,
                                                  "probe_span")
    record("stream_windowed_span_dedup",
           stream_windowed_span_dedup(stream, state, ckpt), t0, state,
           lambda: windowed_span_dedup_finalize(spark, state))

    t0 = time.time()
    stream, state, ckpt = sr._replay_ordered_docs(spark, sf_dir,
                                                  "probe_mh")
    record("stream_windowed_minhash_dedup",
           stream_windowed_minhash_dedup(stream, state, ckpt), t0, state,
           lambda: windowed_minhash_dedup_finalize(spark, state))
    return res


def main():
    build_sf1()
    out = {"note": "10x key-shifted replicas; doc_id strided 1e6 so "
                   "the trailing window never spans replicas",
           "results": {}}
    for tag, sf in (("sf0.1", SF01), ("sf1", SF1)):
        for name, r in _probe(sf).items():
            out["results"].setdefault(name, {})[tag] = r
    for name, r in out["results"].items():
        r["wall_ratio_10x"] = round(
            r["sf1"]["wall_sec"] / max(r["sf0.1"]["wall_sec"], 0.01), 2)
        r["snapshot_bytes_ratio_10x"] = round(
            r["sf1"]["final_snapshot_bytes"]
            / max(r["sf0.1"]["final_snapshot_bytes"], 1), 2)
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "tools", "scale_probe_r09.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: {"wall": v["wall_ratio_10x"],
                          "state_bytes": v["snapshot_bytes_ratio_10x"]}
                      for k, v in out["results"].items()}, indent=1))


if __name__ == "__main__":
    main()
