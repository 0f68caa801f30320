"""Structured Streaming: file-source event stream driven to completion
against the memory sink; batch/stream agreement on the window counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.streaming import events as SE


def test_minute_window_stream_matches_batch(spark, sf_dir):
    stream = SE.read_event_stream(spark, f"{sf_dir}/events.parquet")
    assert stream.isStreaming
    agg = SE.minute_window_counts(stream)
    out = SE.run_stream_to_memory(spark, agg, "stream_minute_counts")

    batch = (
        load_table(spark, "events", sf_dir)
        .groupBy(F.window("ts", "1 minute").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {
        (r.window_start, r.event_type): r.n
        for r in out.collect()
    }
    want = {(r.w.start, r.event_type): r.n for r in batch.collect()}
    # watermark in append mode only emits windows older than the
    # watermark; every emitted window must match batch exactly
    assert len(got) > 0
    for k, v in got.items():
        assert want.get(k) == v, f"window {k}: stream {v} != batch {want.get(k)}"


def test_session_window_stream_runs(spark, sf_dir):
    stream = SE.read_event_stream(spark, f"{sf_dir}/events.parquet")
    agg = SE.session_windows(stream, gap="30 minutes")
    out = SE.run_stream_to_memory(spark, agg, "stream_sessions")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows)


def test_with_import_time_is_processing_time(spark, sf_dir):
    df = SE.with_import_time(load_table(spark, "events", sf_dir).limit(5))
    ts = [r.data_import_time for r in df.collect()]
    assert all(t is not None for t in ts)
