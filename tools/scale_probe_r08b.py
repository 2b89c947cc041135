"""sf1 spot-probe of the remaining r08 ops (the r07b pattern): run
each NEW operator at sf0.1 and at the real-sf1 uniform fixture
(/tmp/spark_graft_sf1_r07, 50k fresh docs = 10x) and record wall +
output rows, so every new op ships with measured 10x evidence, not
just plan-shape argument.  (dedup_substring_suffix_array and the
Zipf-specific measurements live in scale_probe_r08.py.)

Run:  python tools/scale_probe_r08b.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1_r07"

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "12g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

NAMES = [
    "text_bm25_retrieval",
    "lsh_banding_advisor",
    "unigram_lm_train_v1k",
    "stream_windowed_span_dedup_replay",
    "stream_minhash_dedup_replay",
    "domain_mixture_mw_iterated",
    "dedup_substring_len_profile",
    "text_textrank_keywords",
]


def main():
    if not os.path.isdir(os.path.join(SF1, "documents.parquet")):
        sys.exit(f"sf1 fixture missing at {SF1} — run scale_probe_r07.py")
    from go_mapreduce_crawler_spark.operators import all_queries
    q = all_queries()
    out = {"note": "uniform sf1 fixture = 10x docs vs sf0.1",
           "results": {}}
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
        repo, "tools", "scale_probe_r08b.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v["wall_ratio_10x"]
                      for k, v in out["results"].items()}, indent=1))


if __name__ == "__main__":
    main()
