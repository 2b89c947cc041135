"""sf1 probe for the r10 RETRIEVAL family (r09 verdict item 7) — the
family every earlier probe EXCLUDED because its exact dense arm is
|Q| x |N| by contract.  The r10 IVF-backed hybrid removes that
contract, so this probe measures it: 10x the corpus with the QUERY
WORKLOAD HELD FIXED (the production shape — a monitoring/eval query
set does not grow with ingest), expecting linear-or-better wall.

Fixture recipe: replica ids must NEVER satisfy a seed predicate
(doc_id % 100 == 0 for the hybrid arms, % 20 for the RAG pipeline,
% 97 for the bloom eval set) — a plain shift only relabels which ids
are seeds, it does not remove them (each shifted replica still
contains ~1/100 ids = 0 mod 100).  So replicas 1..9 remap
id -> STRIDE*rep + id*9700 + 1: 9700 = lcm(100, 20, 97), making
id' = 1 (mod 100), (mod 20) and (mod 97) for EVERY replica row —
never a seed/eval doc — while rep 0 keeps the originals verbatim.
Documents and embeddings remap by the SAME rule, preserving the
shared doc/vec id space hybrid fusion requires.

Covered: hybrid_retrieval_rrf_ivf (the verdict item),
pipeline_rag_index_e2e, stream_decontam_bloom_replay (the other two
r10 additions).

Run:  python tools/scale_probe_r10.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1_r10"
REPLICAS = 10
STRIDE = 97_000_000        # > max(old_id) * 9700; = 0 (mod 9700)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "12g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

NAMES = [
    "hybrid_retrieval_rrf_ivf",
    "pipeline_rag_index_e2e",
    "stream_decontam_bloom_replay",
]


def _remap(id_col):
    """rep 0 -> verbatim id; reps 1..9 -> never-a-seed id space."""
    return (F.when(F.col("rep") == 0, F.col(id_col))
            .otherwise(F.col("rep") * STRIDE
                       + F.col(id_col) * 9700 + 1))


def build_sf1():
    os.makedirs(SF1, exist_ok=True)
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        d = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
        rep = d.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("rep")))
        (rep.select(
            _remap("doc_id").alias("doc_id"),
            "text", "lang", "source", "n_chars")
         .repartition(8)
         .write.parquet(os.path.join(SF1, "documents.parquet")))
    if not os.path.exists(os.path.join(SF1, "embeddings.parquet")):
        e = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
        cols = [c for c in e.columns if c != "vec_id"]
        rep = e.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("rep")))
        (rep.select(
            _remap("vec_id").alias("vec_id"),
            *cols)
         .repartition(8)
         .write.parquet(os.path.join(SF1, "embeddings.parquet")))


def main():
    build_sf1()
    from go_mapreduce_crawler_spark.operators import all_queries
    q = all_queries()
    out = {"note": f"10x key-shifted replicas, stride {STRIDE} "
                   "(seed predicates preserved on originals only; "
                   "query workload FIXED at 10x corpus)",
           "results": {}}
    for tag, sf in (("sf0.1", SF01), ("sf1", SF1)):
        for name in NAMES:
            t = time.time()
            n = q[name](spark, sf).count()
            wall = round(time.time() - t, 2)
            out["results"].setdefault(name, {})[tag] = {
                "wall_sec": wall, "rows": n}
            print(f"{tag} {name}: {wall}s, {n} rows", flush=True)
    for name, r in out["results"].items():
        r["ratio"] = round(r["sf1"]["wall_sec"]
                           / max(r["sf0.1"]["wall_sec"], 0.01), 2)
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "tools", "scale_probe_r10.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("->", dst)


if __name__ == "__main__":
    main()
