"""Structured Streaming slice: availableNow-driven runs equal their batch
equivalents; foreachBatch drives the segment-refresh loop."""

import pytest
from pyspark.sql import functions as F

from audience_manager_platform_spark.sources import load_table
from audience_manager_platform_spark.streaming.jobs import (
    run_available_now,
    segment_refresh_stream,
    sessionize,
    stream_events,
    windowed_event_counts,
)


def test_streaming_window_counts_equal_batch(spark, sf_dir):
    events = stream_events(spark, sf_dir)
    result = windowed_event_counts(events, window="1 day", watermark="1 hour")
    run_available_now(result, "t_stream_counts")
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("t_stream_counts").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        ).collect()
    }
    assert streamed == batch


def test_sliding_window(spark, sf_dir):
    events = stream_events(spark, sf_dir)
    result = windowed_event_counts(events, window="2 days", slide="1 day")
    run_available_now(result, "t_stream_sliding")
    rows = spark.table("t_stream_sliding").collect()
    # sliding: every event lands in 2 windows -> total count doubles
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, sf_dir, "events").count() * 2


def test_sessionize_gap_semantics(spark):
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 1.0),
        (1, datetime(2024, 1, 1, 10, 20), 1.0),  # same session (gap 20m)
        (1, datetime(2024, 1, 1, 11, 0), 1.0),  # new session (gap 40m)
        (2, datetime(2024, 1, 1, 10, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize(df, gap="30 minutes").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append((r.session_start, r.n_events))
    assert sorted(per_user[1]) == [
        ("2024-01-01 10:00:00", 2),
        ("2024-01-01 11:00:00", 1),
    ]
    assert per_user[2] == [("2024-01-01 10:00:00", 1)]


def test_foreach_batch_segment_refresh(spark, sf_dir, tmp_path):
    from audience_manager_platform_spark.catalog import Catalog
    from audience_manager_platform_spark.engine import AudienceEngine
    from audience_manager_platform_spark.sources import (
        unified_transactions_from_events,
    )

    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    engine = AudienceEngine(spark, Catalog(str(tmp_path / "cat")), lambda: txns)
    rule = engine.create_rule(
        "stream_refresh", [{"field": "transaction_amount", "operator": ">", "value": "120"}]
    )
    events = stream_events(spark, sf_dir)
    q = segment_refresh_stream(
        events, engine, rule.rule_id, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    meta = engine.catalog.get_segment(rule.rule_id)
    assert meta.row_count and meta.row_count > 0
    assert engine.read_segment(rule.rule_id).count() == meta.row_count
