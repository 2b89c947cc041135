"""sf1 scale evidence: run a query family at sf0.01 / sf0.1 / synthetic
sf1 and record wall time + shuffle read/write bytes per SF, so the
"designed for 100x" claims in SCALE.md carry measured numbers.

The synthetic sf1 is sf0.1 replicated 10x into /tmp (the driver ships no
sf1 parquet):
- documents: replica i prefixes every word with ``r{i}`` (i>0), so each
  replica keeps the ORIGINAL corpus's internal similarity structure but
  shares no shingles across replicas — pair cardinality and cluster
  sizes scale exactly linearly, the clean scaling experiment (a plain
  copy would make every doc a 10-way exact dup and measure a quadratic
  skew stress instead).
- lineitem: key-shifted copies; group labels and value domains are
  unchanged, so the compacted (group, value, cnt) relations the
  median/rank family shuffles should stay ~CONSTANT while input rows
  grow 10x — that invariance is the claim under test.

Shuffle bytes come from the Spark UI REST API (per job group -> jobs ->
stages), the same numbers the History Server shows.

Run:  python tools/scale_probe.py [out_json]
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
         .config("spark.ui.port", "4055")
         .config("spark.driver.memory", "12g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def build_sf1():
    os.makedirs(SF1, exist_ok=True)
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        d = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
        reps = None
        for i in range(REPLICAS):
            r = d.select(
                (F.col("doc_id") + i * KEY_STRIDE).alias("doc_id"),
                (F.col("text") if i == 0 else
                 F.array_join(
                     F.transform(F.split("text", " "),
                                 lambda w: F.concat(F.lit(f"r{i}"), w)),
                     " ")).alias("text"),
                "lang", "source", "n_chars")
            reps = r if reps is None else reps.unionAll(r)
        reps.coalesce(8).write.mode("overwrite").parquet(
            os.path.join(SF1, "documents.parquet"))
    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        l = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
        reps = None
        for i in range(REPLICAS):
            r = l.withColumn("l_orderkey",
                             F.col("l_orderkey") + i * KEY_STRIDE)
            reps = r if reps is None else reps.unionAll(r)
        reps.coalesce(16).write.mode("overwrite").parquet(
            os.path.join(SF1, "lineitem.parquet"))


def _rest(path):
    url = f"http://localhost:4055/api/v1/applications/{sc.applicationId}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def shuffle_bytes_for_group(group):
    jobs = [j for j in _rest("/jobs")
            if j.get("jobGroup") == group]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    rd = wr = 0
    for sid in stage_ids:
        try:
            for att in _rest(f"/stages/{sid}"):
                rd += att.get("shuffleReadBytes", 0)
                wr += att.get("shuffleWriteBytes", 0)
        except urllib.error.HTTPError:
            pass                         # skipped stage (no attempts)
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
    families = {
        "dedup_minhash_lsh": q["dedup_minhash_lsh"],
        "dedup_simhash": q["dedup_simhash"],
        "dedup_components_lsh": q["dedup_components_lsh"],
        "median_per_group": q["median_per_group"],
        "weighted_median_price": q["weighted_median_price"],
        "percentile_cont_exact": q["percentile_cont_exact"],
    }
    inputs = {
        "documents": ["dedup_minhash_lsh", "dedup_simhash",
                      "dedup_components_lsh"],
        "lineitem": ["median_per_group", "weighted_median_price",
                     "percentile_cont_exact"],
    }
    out = {"replicas": REPLICAS, "results": {}}
    for table, names in inputs.items():
        for tag, sf in (("sf0.01", SF001), ("sf0.1", SF01), ("sf1", SF1)):
            in_rows = spark.read.parquet(
                os.path.join(sf if tag == "sf1" else sf,
                             f"{table}.parquet")).count()
            for name in names:
                r = probe(name, families[name], sf, tag)
                r["input_rows"] = in_rows
                out["results"].setdefault(name, {})[tag] = r
                print(f"{name} @ {tag}: {r}", flush=True)
    dest = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(repo, "tools", "scale_probe_r05.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print("->", dest)


if __name__ == "__main__":
    main()
