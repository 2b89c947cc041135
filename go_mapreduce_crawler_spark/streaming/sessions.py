"""Structured Streaming operators over the events stream.

The reference's channel pipeline is intra-query dataflow, not an
unbounded-stream model (SURVEY.md §2.2) — these go beyond parity, giving
the engine the streaming surface a production pipeline needs: watermarked
tumbling/sliding windows and native session windows.

Batch/stream parity: the batch twin of `stream_sessionize` is
operators.relational.q_sessionize; tests run the streaming version on the
same events data with a file/memory source and compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_windowed_counts(events: DataFrame,
                           window: str = "1 hour",
                           slide: str | None = None,
                           watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling (or sliding) window counts per event_type.

    Late rows beyond the watermark are dropped; state is bounded by
    (watermark / window) per key — the property that keeps this runnable
    forever on an unbounded stream.
    """
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (events.withWatermark("ts", watermark)
            .groupBy(win.alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.unix_micros("win.start").alias("win_start_us"),
                    F.unix_micros("win.end").alias("win_end_us"),
                    "event_type", "n_events", "sum_value"))


def stream_sessionize(events: DataFrame,
                      gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Native session windows (gap-close semantics) per user.

    `session_window` merges events within `gap` of each other — the
    streaming-native equivalent of the batch lag/cumsum formulation in
    operators.relational.q_sessionize.
    """
    # DECIMAL(18,2) session sums: the merge order of a session's
    # events differs between engines and micro-batchings; exact decimal
    # addition is associative-commutative bit-for-bit, which is what
    # lets the replay driver row carry a full value oracle.
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .alias("sum_dec"))
            .select("user_id",
                    F.unix_micros("sw.start").alias("start_us"),
                    F.unix_micros("sw.end").alias("end_us"),
                    "n_events",
                    F.col("sum_dec").cast("double").alias("sum_value")))


def stream_trending_counts(events: DataFrame,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming half of trending-topics: watermarked tumbling counts
    per (window, event_type), append mode — each window's counts emit
    exactly once, when the watermark closes it.

    Ranking (the top-k step) is NOT expressible on an open stream —
    a window function over a streaming aggregate would re-rank on
    every update — so the contract splits: this emits closed windows;
    ``trending_topk_finalize`` ranks them (run it inside foreachBatch
    on the appended rows, or on the sink table).  The batch twin is
    operators.temporal's events_trending_k.
    """
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.unix_micros("win.start").alias("win_start_us"),
                    "event_type", "n_events"))


def trending_topk_finalize(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank closed-window counts to the top-k types per window —
    deterministic tie-break on event_type.  Batch-side finalizer for
    stream_trending_counts (foreachBatch / sink-table step)."""
    from pyspark.sql import Window as W
    w = (W.partitionBy("win_start_us")
          .orderBy(F.desc("n_events"), F.asc("event_type")))
    return (counts.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= k))
