"""Salted aggregation equivalence + stateful streaming monitor."""

from pyspark.sql import functions as F

from audience_manager_platform_spark.operators.skew import salted_sum_count
from audience_manager_platform_spark.sources import load_table


def test_salted_equals_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = {
        r.user_id: (r.n, r.total)
        for r in salted_sum_count(ev, "user_id", "value").collect()
    }
    direct = {
        r.user_id: (r.n, r.total)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert salted == direct


def test_stateful_spend_monitor(spark, sf_dir):
    from audience_manager_platform_spark.streaming.jobs import stream_events
    from audience_manager_platform_spark.streaming.stateful import (
        running_spend_monitor,
    )

    events = stream_events(spark, sf_dir).select("user_id", "value")
    out = running_spend_monitor(events, threshold=1000.0)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    got = {
        r.user_id: r
        for r in spark.sql(
            "select user_id, max(event_count) event_count, max(total_value) total_value,"
            " max(crossed_threshold) crossed from t_stateful group by user_id"
        ).collect()
    }
    expected = {
        r.user_id: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert set(got) == set(expected)
    for uid, row in expected.items():
        assert got[uid].event_count == row.n
        assert abs(got[uid].total_value - row.total) < 0.02
        assert got[uid].crossed == (row.total > 1000.0)
