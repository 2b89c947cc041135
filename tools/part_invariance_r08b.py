"""Partitioning-invariance check: each r08b (second-session) op must
produce the IDENTICAL result set on a local[4] session with
shuffle.partitions=3 as on the default local[8]/32 session
(order-insensitive compare)."""
import json, sys
sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession

NEW = ["dedup_cluster_sampling_weights", "gdpr_delete_cascade",
       "join_strategy_advisor", "quality_adaptive_threshold",
       "multimodal_audio_energy", "sample_neyman_allocation",
       "dedup_incremental_lsh", "ivf_index_delta_refresh",
       "schema_drift_detect", "stream_gdpr_forget_replay",
       "eval_langid_confusion", "bpe_fertility_by_lang",
       "shuffle_partition_advisor", "dedup_family_overlap",
       "reservoir_delta_refresh", "knn_graph_ivf",
       "multimodal_video_scene_cuts", "semantic_knn_clusters",
       "bloom_filter_advisor", "stream_ivf_index_replay",
       "text_kneser_ney_score", "stream_sessionize_replay",
       "text_watermark_scan", "inverted_index_compression_report",
       "events_markov_stationary", "column_encoding_advisor",
       "validate_media", "embedding_dim_budget_eval",
       "events_changepoint_cusum", "stream_anomaly_scoring_replay",
       "sink_roundtrip_csv", "sink_roundtrip_orc",
       "stream_trending_topk_replay", "text_collocations_llr"]
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
