"""r12 sf1 core-scaling evidence (r11 verdict item 5).

The sf0.1 bench is fixed-cost-bound (8-core total ~= 32-core total),
so it cannot demonstrate parallel speedup.  This probe builds a
synthetic sf1 (sf0.1 replicated 10x — documents word-prefixed per
replica so shingle/gram structure scales linearly, events/embeddings
key-shifted so per-key joins stay within a replica) and times the
top-cost query families at local[8] vs local[32] with SF-AWARE
shuffle partitions (SPARK_GRAFT_SHUFFLE=64 ~ data/128MB at this
volume, not the sf0.1-sized 8), recording the ratio a 100 TB cluster
cares about.

Run:  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=64 \
          python tools/scale_probe_r12.py tools/scale_probe_r12_c32.json
      SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SHUFFLE=64 \
          python tools/scale_probe_r12.py tools/scale_probe_r12_c8.json
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1_r12"
REPLICAS = 10
KEY_STRIDE = 1_000_000_000

QUERIES = [
    "dedup_substring_len_profile",
    "dedup_substring_suffix_array",
    "retrieval_prf_expansion",
    "hybrid_qld_bm25_rrf",
    "eval_retrieval_recall_mrr",
    "bpe_train_batched512",
    "bpe_fertility_by_lang",
    "unigram_lm_train_v1k",
    "text_collocations_llr",
    "dedup_spans_ngram",
    "stream_windowed_span_dedup_replay",
    "stream_stream_join_replay",
]

from pyspark.sql import functions as F  # noqa: E402

from go_mapreduce_crawler_spark.session import get_spark  # noqa: E402

spark = get_spark("scale_probe_r12")


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
        reps.repartition(16).write.mode("overwrite").parquet(
            os.path.join(SF1, "documents.parquet"))
    if not os.path.exists(os.path.join(SF1, "events.parquet")):
        e = spark.read.parquet(os.path.join(SF01, "events.parquet"))
        reps = None
        for i in range(REPLICAS):
            r = (e.withColumn("event_id",
                              F.col("event_id") + i * KEY_STRIDE)
                  .withColumn("user_id",
                              F.col("user_id") + i * KEY_STRIDE))
            reps = r if reps is None else reps.unionAll(r)
        reps.repartition(16).write.mode("overwrite").parquet(
            os.path.join(SF1, "events.parquet"))
    if not os.path.exists(os.path.join(SF1, "embeddings.parquet")):
        v = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
        reps = None
        for i in range(REPLICAS):
            r = v.withColumn("vec_id", F.col("vec_id") + i * KEY_STRIDE)
            reps = r if reps is None else reps.unionAll(r)
        reps.repartition(16).write.mode("overwrite").parquet(
            os.path.join(SF1, "embeddings.parquet"))


def main():
    build_sf1()
    from go_mapreduce_crawler_spark.operators import all_queries
    qs = all_queries()
    out = {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
           "shuffle": os.environ.get("SPARK_GRAFT_SHUFFLE", "8"),
           "replicas": REPLICAS, "queries": {}}
    for name in QUERIES:
        try:
            qs[name](spark, SF1).count()      # warm (codegen + fixtures)
        except Exception as ex:
            out["queries"][name] = f"ERROR {type(ex).__name__}: {ex}"[:200]
            spark.catalog.clearCache()
            continue
        spark.catalog.clearCache()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF1).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        out["queries"][name] = round(best, 2)
        print(f"{name}: {best:.2f}s", flush=True)
    dest = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(repo, "tools", "scale_probe_r12.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print("->", dest)


if __name__ == "__main__":
    main()
