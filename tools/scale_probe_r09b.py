"""sf1 spot-probe for the r09 BATCH ops: wall ratios at 10x data over
the key-shifted replica fixtures built by scale_probe_r09.py
(events + documents; doc_id strided 1e6).

Covered: the text/behavior/curation/sink additions whose scale
contracts are linear-or-sublinear (one keyed shuffle + compacted
aggs).  EXCLUDED with reasons: the retrieval family
(hybrid_retrieval_rrf / eval_retrieval_ndcg / retrieval_mmr_diversify
/ sample_coreset_kcenter) pairs a corpus-proportional QUERY SET with
an exact dense arm — work is |Q|x|N| BY CONTRACT (the exact baseline;
ann_* are the scale path and KNN_MAX_QUERIES gates the closure), and
the replica fixture only 10x's documents, which would break the
shared doc/vec id space the hybrid contract requires.

Run:  python tools/scale_probe_r09b.py [out_json]
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

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "12g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

NAMES = [
    "text_keyphrase_rake",
    "text_word_burstiness",
    "behavior_cep_pattern",
    "quality_ensemble_gate",
    "curation_epoch_schedule",
    "sink_schema_evolution",
    "stream_inverted_index_replay",
]


def main():
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        sys.exit("run tools/scale_probe_r09.py first (builds the "
                 "10x fixtures)")
    from go_mapreduce_crawler_spark.operators import all_queries
    q = all_queries()
    out = {"note": "10x key-shifted replicas from scale_probe_r09.py",
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
        repo, "tools", "scale_probe_r09b.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v["wall_ratio_10x"]
                      for k, v in out["results"].items()}, indent=1))


if __name__ == "__main__":
    main()
