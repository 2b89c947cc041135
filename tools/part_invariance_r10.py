"""Partitioning-invariance check: each r10 new/changed op must produce
the IDENTICAL result set on a local[4] session with
shuffle.partitions=3 as on the default local[8]/32 session
(order-insensitive compare)."""
import json
import sys

sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession

NEW = [
    # r10 new ops
    "stream_decontam_bloom_replay", "hybrid_retrieval_rrf_ivf",
    "pipeline_rag_index_e2e", "ivf_probe_sweep_advisor",
    "retrieval_prf_expansion",
    # code-changed-this-round ops (CEP chunked build, bloom refactor,
    # lexical-arm factor, coreset checkpoint, epoch-schedule oracle
    # splice — Spark side unchanged but re-pinned, session-tmp memo)
    "behavior_cep_pattern", "text_contamination_bloom",
    "hybrid_retrieval_rrf", "sample_coreset_kcenter",
    "curation_epoch_schedule", "sink_compact_small_files",
]
SF = "/root/testdata/sf0.01"


def run(master, parts, name_suffix):
    spark = (SparkSession.builder.master(master)
             .appName("pi" + name_suffix)
             .config("spark.sql.shuffle.partitions", str(parts))
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    q = e.queries()
    out = {}
    for n in NEW:
        rows = q[n](spark, SF).collect()
        out[n] = sorted(tuple(r) for r in rows)
    spark.stop()
    return out


a = run("local[4]", 3, "a")
b = run("local[8]", 32, "b")
res = {n: ("OK" if a[n] == b[n] else "MISMATCH") for n in NEW}
print(json.dumps(res, indent=1))
assert all(v == "OK" for v in res.values()), res
print(f"{len(NEW)}/{len(NEW)} partitioning-invariant")
