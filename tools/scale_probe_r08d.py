"""sf1 spot-probe of the r08b ops (third wave added: KN LM score,
postings compression, watermark scan — documents-based; the events
ops (markov stationary, CUSUM) are excluded because their post-agg
state is CALENDAR/type-bounded by construction — a 10x event replica
changes only the count shuffle, which the relational probes already
cover): run each NEW
documents-based operator at sf0.1 and at the real-sf1 fixture (50k
fresh docs = 10x, regenerated with the scale_probe_r07 generative
process — same seeds, so the corpus is byte-identical across rounds),
plus a 10x embeddings fixture (5k -> 50k seeded vectors) for the IVF
index maintenance op.  Records wall + output rows per SF.

Excluded with reasons (recorded in the JSON):
  - dedup_family_overlap: embeds the exact-Jaccard GROUND-TRUTH family,
    whose pair output is quadratic on this near-clique fixture BY
    DESIGN (diagnostic; the production contract is to calibrate on a
    sample — the banded families it grades are the probed scale path).
  - gdpr_delete_cascade / join_strategy_advisor /
    shuffle_partition_advisor / schema_drift_detect /
    stream_gdpr_forget_replay / sample_neyman_allocation: single-scan
    partial+final aggregates over fact tables (no documents fixture
    dependency); their plans contain no super-linear stage to probe —
    the plan audit + invariance run is the evidence.

Run:  python tools/scale_probe_r08d.py [out_json]
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1_r07"
N_DOCS = 50_000
N_VECS = 50_000
DIMS = 64

VOCAB = ["spark", "window", "merge", "table", "column", "vector",
         "stream", "value", "data", "small", "join", "filter", "big",
         "group", "hash", "customer", "sort", "order", "slow", "line",
         "part", "fast", "the", "row", "agg", "key", "query", "a",
         "scan", "batch"]
LANGS = ["en"] * 41 + ["de"] * 15 + ["es"] * 15 + ["fr"] * 15 + ["zh"] * 14

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "12g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

NAMES = [
    "text_kneser_ney_score",
    "inverted_index_compression_report",
    "text_watermark_scan",
    "quality_adaptive_threshold",
    "eval_langid_confusion",
    "multimodal_audio_energy",
    "bpe_fertility_by_lang",
    "dedup_incremental_lsh",
    "dedup_cluster_sampling_weights",
    "ivf_index_delta_refresh",
]


def gen_documents():
    """The scale_probe_r07 generative process, verbatim (same seeds)."""
    rows = []
    for i in range(N_DOCS):
        rng = random.Random(
            int(hashlib.md5(f"sf1doc{i}".encode()).hexdigest()[:8], 16))
        r = rng.random()
        if i > 10 and r < 0.002:                       # exact dup
            src = rows[rng.randrange(len(rows))]
            text = src[1]
        elif i > 10 and r < 0.052:                     # verbatim near-dup
            src = rows[rng.randrange(len(rows))]
            words = src[1].split(" ")
            words.insert(rng.randrange(len(words) + 1), "dup")
            text = " ".join(words)
        else:
            n = rng.randint(10, 100)
            text = " ".join(rng.choice(VOCAB) for _ in range(n))
        rows.append((i, text, rng.choice(LANGS),
                     f"src{rng.randrange(20)}", len(text)))
    return rows


def gen_embeddings():
    """10x seeded vectors with the sf0.1 shape (64 float dims, 4 labels)."""
    rows = []
    for i in range(N_VECS):
        rng = random.Random(
            int(hashlib.md5(f"sf1vec{i}".encode()).hexdigest()[:8], 16))
        rows.append((i, [rng.uniform(-1.0, 1.0) for _ in range(DIMS)],
                     rng.randrange(4)))
    return rows


def build_sf1():
    os.makedirs(SF1, exist_ok=True)
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        spark.createDataFrame(
            gen_documents(),
            "doc_id long, text string, lang string, source string,"
            " n_chars long").repartition(8).write.parquet(
            os.path.join(SF1, "documents.parquet"))
    if not os.path.exists(os.path.join(SF1, "embeddings.parquet")):
        spark.createDataFrame(
            gen_embeddings(),
            "vec_id long, embedding array<float>, label int") \
            .repartition(8).write.parquet(
            os.path.join(SF1, "embeddings.parquet"))


def main():
    build_sf1()
    from go_mapreduce_crawler_spark.operators import all_queries
    q = all_queries()
    out = {"note": "sf1 = 10x docs (r07 generator, same seeds) + 10x "
                   "seeded embeddings; excluded ops documented in the "
                   "module docstring",
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
        repo, "tools", "scale_probe_r08d.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v["wall_ratio_10x"]
                      for k, v in out["results"].items()}, indent=1))


if __name__ == "__main__":
    main()
