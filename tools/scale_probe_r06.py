"""sf1 scale evidence for the r06 operators: run each family at
sf0.01 / sf0.1 / synthetic sf1 and record wall time + shuffle bytes.

Replication recipes (10x sf0.1 -> sf1):
- events: user_id/event_id key-shifted, timestamps/types/values
  UNCHANGED — quantile_sketch_rollup's daily sketch cells (type x day
  x ~700 bins) must stay ~INVARIANT while inputs grow 10x.
- documents: doc_id-shifted replicas — zipf/heaps/eval ops re-count a
  10x corpus over the SAME vocabulary (head relations invariant).
- orders: o_orderkey-shifted replicas with o_custkey UNCHANGED — the
  realistic scale-up (fact grows, dim fixed) for the bloom-prefilter
  and delta-MV joins; customer copied as-is.

Run:  python tools/scale_probe_r06.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.error
import urllib.request

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"
REPLICAS = 10
KEY_STRIDE = 1_000_000_000

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "true")
         .config("spark.ui.port", "4057")
         .config("spark.driver.memory", "12g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def build_sf1():
    os.makedirs(SF1, exist_ok=True)
    if not os.path.exists(os.path.join(SF1, "events.parquet")):
        e = spark.read.parquet(os.path.join(SF01, "events.parquet"))
        reps = None
        for i in range(REPLICAS):
            r = e.select(
                (F.col("event_id") + i * KEY_STRIDE).alias("event_id"),
                "ts",
                (F.col("user_id") + i * KEY_STRIDE).alias("user_id"),
                "event_type", "value", "props")
            reps = r if reps is None else reps.unionAll(r)
        reps.coalesce(16).write.mode("overwrite").parquet(
            os.path.join(SF1, "events.parquet"))
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        d = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
        reps = None
        for i in range(REPLICAS):
            r = d.select(
                (F.col("doc_id") + i * KEY_STRIDE).alias("doc_id"),
                "text", "lang", "source", "n_chars")
            reps = r if reps is None else reps.unionAll(r)
        reps.coalesce(8).write.mode("overwrite").parquet(
            os.path.join(SF1, "documents.parquet"))
    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
        reps = None
        for i in range(REPLICAS):
            r = li.withColumn("l_orderkey",
                              F.col("l_orderkey") + i * KEY_STRIDE)
            reps = r if reps is None else reps.unionAll(r)
        reps.coalesce(16).write.mode("overwrite").parquet(
            os.path.join(SF1, "lineitem.parquet"))
    if not os.path.exists(os.path.join(SF1, "orders.parquet")):
        o = spark.read.parquet(os.path.join(SF01, "orders.parquet"))
        reps = None
        for i in range(REPLICAS):
            r = o.withColumn("o_orderkey",
                             F.col("o_orderkey") + i * KEY_STRIDE)
            reps = r if reps is None else reps.unionAll(r)
        reps.coalesce(16).write.mode("overwrite").parquet(
            os.path.join(SF1, "orders.parquet"))
    if not os.path.exists(os.path.join(SF1, "customer.parquet")):
        spark.read.parquet(os.path.join(SF01, "customer.parquet")) \
            .write.mode("overwrite").parquet(
                os.path.join(SF1, "customer.parquet"))


def _rest(path):
    url = (f"http://localhost:4057/api/v1/applications/"
           f"{sc.applicationId}{path}")
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def shuffle_bytes_for_group(group):
    jobs = [j for j in _rest("/jobs") if j.get("jobGroup") == group]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    rd = wr = 0
    for sid in stage_ids:
        try:
            for att in _rest(f"/stages/{sid}"):
                rd += att.get("shuffleReadBytes", 0)
                wr += att.get("shuffleWriteBytes", 0)
        except urllib.error.HTTPError:
            pass
    return rd, wr


def probe(name, fn, sf_dir, tag):
    group = f"probe-{name}-{tag}"
    sc.setJobGroup(group, name)
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    sec = round(time.time() - t0, 2)
    sc.setJobGroup("idle", "idle")
    rd, wr = shuffle_bytes_for_group(group)
    return {"rows": n, "sec": sec,
            "shuffle_read_mb": round(rd / 1e6, 1),
            "shuffle_write_mb": round(wr / 1e6, 1)}


def main():
    build_sf1()
    from go_mapreduce_crawler_spark.operators import all_queries
    q = all_queries()
    inputs = {
        "events": ["quantile_sketch_rollup", "diag_partition_skew",
                   "survival_kaplan_meier"],
        "documents": ["text_zipf_slope", "corpus_heaps_curve",
                      "eval_auc_stopword", "bpe_train_batched"],
        "orders": ["join_bloom_prefilter", "mv_join_delta_refresh"],
    }
    out = {"replicas": REPLICAS, "results": {}}
    for table, names in inputs.items():
        for tag, sf in (("sf0.01", SF001), ("sf0.1", SF01), ("sf1", SF1)):
            in_rows = spark.read.parquet(
                os.path.join(sf, f"{table}.parquet")).count()
            for name in names:
                r = probe(name, q[name], sf, tag)
                r["input_rows"] = in_rows
                out["results"].setdefault(name, {})[tag] = r
                print(f"{name} @ {tag}: {r}", flush=True)
    dest = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(repo, "tools", "scale_probe_r06.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("->", dest)


if __name__ == "__main__":
    main()
