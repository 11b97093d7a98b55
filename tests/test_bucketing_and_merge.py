"""Bucketed co-located joins (shuffle elimination) + MERGE-style upsert."""

import pytest
from pyspark.sql import functions as F

from audience_manager_platform_spark.operators.merge import upsert
from audience_manager_platform_spark.sources import load_table

from .test_plans import _plan


def test_bucketed_join_eliminates_shuffle(spark, sf_dir):
    """Both sides bucketed on the join key -> SortMergeJoin reads bucketed
    scans directly: NO Exchange in the plan (the 100 TB co-location
    story: pay the shuffle once at write time, never per query)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        cust.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("b_customer")
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _plan(joined, "simple")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # and the join is still correct
        assert joined.count() == load_table(spark, sf_dir, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_upsert_semantics(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "user_id long, total double"
    )
    new = spark.createDataFrame([(2, 99.0), (4, 40.0)], "user_id long, total double")
    out = {r.user_id: r.total for r in upsert(old, new, ["user_id"]).collect()}
    assert out == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}


def test_incremental_segment_refresh_equals_full(spark, sf_dir):
    """Folding a late-window delta into an earlier materialization gives
    the same result as a full recompute (counts/sums are NOT additive in
    this check — the delta recomputes affected users entirely, which is
    the contract: delta = fresh aggregate of affected keys)."""
    from audience_manager_platform_spark.sources import (
        unified_transactions_from_events,
    )

    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    cutoff = "2024-01-20 00:00:00"
    affected = txns.filter(F.col("transaction_date") >= cutoff).select("user_id").distinct()

    def agg(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"), F.round(F.sum("amount"), 2).alias("total")
        )

    old_full = agg(txns.filter(F.col("transaction_date") < cutoff))
    delta = agg(txns.join(affected, "user_id"))  # recompute affected users fully
    merged = {r.user_id: (r.n, r.total) for r in upsert(old_full, delta, ["user_id"]).collect()}
    full = {r.user_id: (r.n, r.total) for r in agg(txns).collect()}
    assert merged == full
