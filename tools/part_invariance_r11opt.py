"""Partitioning-invariance check: each r11-OPT changed op must produce
the IDENTICAL result set on a local[4] session with
shuffle.partitions=3 as on the default local[8]/32 session
(order-insensitive compare)."""
import json
import sys

sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession

NEW = [
    "bpe_train_batched512", "schema_drift_detect", "retrieval_prf_expansion",
    "stream_windowed_span_dedup_replay", "attribution_markov_removal",
    "label_propagation", "dedup_components", "text_collocations_llr",
    "domain_mixture_mw_iterated", "text_remove_boilerplate",
    "retrieval_qld_dirichlet",
    "hybrid_qld_bm25_rrf",
    "eval_retrieval_recall_mrr",
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
