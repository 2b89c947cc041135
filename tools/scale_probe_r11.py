"""sf1 probe for the r11 additions — 10x the corpus with the QUERY
WORKLOAD HELD FIXED (the r10 recipe), measuring that each new/changed
op's wall grows linearly-or-better and its bounded structures stay
bounded:

  - retrieval_qld_dirichlet / hybrid_qld_bm25_rrf: posting-sized arms
    grow ~10x, the salted top-k fold stays HYB_SALT*k; seeds live only
    in replica 0 (id remap keeps every replica id != 0 mod 100).
  - kmv_theta_setops: the corpus-scale distinct agg grows 10x, every
    sketch stays K rows and the output stays |pairs| (asserted).
  - stream_lateness_audit: one prefix-max pass, linear in events.
  - embedding_pca_project: the gram pass is linear; the iteration is a
    constant 64x64 driver loop (wall should barely move past the scan).
  - unigram_lm_train_v1k: the E-step runs on the compacted distinct-
    word relation (Heaps-sublinear; replicas add one 'zrepK' token).

Fixture recipe: replicas 1..9 remap id -> STRIDE*rep + id*9700 + 1
(never ~0 mod 100/20/97 — the seed/eval predicates), rep 0 verbatim;
replica TEXTS get a ' zrepK' suffix so content hashes are distinct
(the KMV distinct agg must actually grow 10x); events shift event_id/
user_id with ts unchanged.

Run:  python tools/scale_probe_r11.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1_r11"
REPLICAS = 10
STRIDE = 97_000_000
EV_STRIDE = 1_000_000_000
USER_STRIDE = 10_000_000

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "12g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

NAMES = [
    "retrieval_qld_dirichlet",
    "hybrid_qld_bm25_rrf",
    "kmv_theta_setops",
    "stream_lateness_audit",
    "embedding_pca_project",
    "unigram_lm_train_v1k",
]


def _remap(id_col):
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
            F.when(F.col("rep") == 0, F.col("text"))
             .otherwise(F.concat("text", F.lit(" zrep"),
                                 F.col("rep").cast("string")))
             .alias("text"),
            "lang", "source", "n_chars")
         .repartition(8)
         .write.parquet(os.path.join(SF1, "documents.parquet")))
    if not os.path.exists(os.path.join(SF1, "embeddings.parquet")):
        e = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
        cols = [c for c in e.columns if c != "vec_id"]
        rep = e.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("rep")))
        (rep.select(_remap("vec_id").alias("vec_id"), *cols)
         .repartition(8)
         .write.parquet(os.path.join(SF1, "embeddings.parquet")))
    if not os.path.exists(os.path.join(SF1, "events.parquet")):
        ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
        cols = [c for c in ev.columns
                if c not in ("event_id", "user_id")]
        rep = ev.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("rep")))
        (rep.select(
            (F.col("event_id") + F.col("rep") * EV_STRIDE)
            .alias("event_id"),
            (F.col("user_id") + F.col("rep") * USER_STRIDE)
            .alias("user_id"), *cols)
         .repartition(8)
         .write.parquet(os.path.join(SF1, "events.parquet")))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(repo, "tools", "scale_probe_r11.json")
    build_sf1()
    import __spark_entry__ as entry
    q = entry.queries()
    res = {}
    for name in NAMES:
        row = {}
        for tag, sf in (("sf0.1", SF01), ("sf1", SF1)):
            q[name](spark, sf).count()          # warm (codegen)
            t0 = time.perf_counter()
            n = q[name](spark, sf).count()
            row[tag] = {"sec": round(time.perf_counter() - t0, 2),
                        "rows": n}
            spark.catalog.clearCache()
        row["wall_ratio_10x"] = round(
            row["sf1"]["sec"] / max(row["sf0.1"]["sec"], 1e-9), 2)
        res[name] = row
        print(name, json.dumps(row))
    # bounded-structure assertions
    assert res["kmv_theta_setops"]["sf1"]["rows"] == \
        res["kmv_theta_setops"]["sf0.1"]["rows"], "pair count moved"
    assert res["stream_lateness_audit"]["sf1"]["rows"] == \
        res["stream_lateness_audit"]["sf0.1"]["rows"]
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print("->", out_path)


if __name__ == "__main__":
    main()
