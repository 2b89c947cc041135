from .sessions import (stream_sessionize, stream_trending_counts,
                       stream_windowed_counts, trending_topk_finalize)
from .stateful import (decayed_engagement_finalize,
                       quantile_sketch_finalize,
                       stream_quantile_sketch,
                       read_mv_state, stream_anomaly_scoring,
                       stream_decayed_engagement,
                       stream_dedup, stream_gap_fill,
                       stream_mv_refresh, stream_running_totals,
                       stream_stream_left_outer_join,
                       stream_stream_purchase_view_join, stream_to_parquet)

__all__ = ["stream_sessionize", "stream_windowed_counts",
           "stream_trending_counts", "trending_topk_finalize",
           "stream_anomaly_scoring",
           "stream_dedup", "stream_gap_fill", "stream_running_totals",
           "stream_stream_purchase_view_join", "stream_stream_left_outer_join",
           "stream_to_parquet",
           "stream_mv_refresh", "read_mv_state",
           "stream_decayed_engagement", "decayed_engagement_finalize",
           "stream_quantile_sketch", "quantile_sketch_finalize"]
