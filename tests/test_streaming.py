"""Structured Streaming surface: drive the streaming operators through a
real file-source stream (availableNow trigger, memory sink) and check
parity against the equivalent batch computation on the same data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from go_mapreduce_crawler_spark.sources.tables import load_table
from go_mapreduce_crawler_spark.streaming import (
    stream_sessionize, stream_windowed_counts)


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    """events sf0.001 written as a small parquet directory to stream from."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, "/root/testdata/sf0.001", "events") \
        .repartition(4).write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_matches_batch(spark, event_stream_dir):
    batch_events = spark.read.parquet(event_stream_dir)
    stream_events = (spark.readStream
                     .schema(batch_events.schema)
                     .parquet(event_stream_dir))
    got = _run_stream(spark, stream_windowed_counts(stream_events), "win_counts")

    expected = (batch_events
                .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
                .agg(F.count(F.lit(1)).alias("n_events")))
    g = {(r.win_start_us, r.event_type): r.n_events for r in got.collect()}
    e = {(int(r.win.start.timestamp() * 1_000_000), r.event_type): r.n_events
         for r in expected.collect()}
    assert g == e


def test_sessionize_stream_matches_batch_session_window(spark, event_stream_dir):
    batch_events = spark.read.parquet(event_stream_dir)
    stream_events = (spark.readStream
                     .schema(batch_events.schema)
                     .parquet(event_stream_dir))
    got = _run_stream(spark, stream_sessionize(stream_events), "sessions")

    expected = (batch_events
                .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
                .agg(F.count(F.lit(1)).alias("n_events")))
    g = {(r.user_id, r.start_us): r.n_events for r in got.collect()}
    e = {(r.user_id, int(r.sw.start.timestamp() * 1_000_000)): r.n_events
         for r in expected.collect()}
    assert g == e
    assert sum(g.values()) == batch_events.count()


def test_session_window_agrees_with_batch_lag_formulation(spark):
    """The native session_window and the lag/cumsum batch formulation
    (relational.q_sessionize) must produce the same session count."""
    from go_mapreduce_crawler_spark.operators.relational import q_sessionize
    sf = "/root/testdata/sf0.001"
    lag_sessions = q_sessionize(spark, sf).count()
    sw_sessions = (load_table(spark, sf, "events")
                   .groupBy(F.session_window("ts", "30 minutes"), "user_id")
                   .count().count())
    assert lag_sessions == sw_sessions
