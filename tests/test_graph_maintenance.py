"""PageRank semantics on hand-built graphs; incremental rollup refresh
equivalence under arbitrary churn splits."""

from datetime import datetime

from pyspark.sql import functions as F

from audience_manager_platform_spark.operators.graph import pagerank
from audience_manager_platform_spark.operators.maintenance import (
    daily_rollup,
    incremental_rollup_refresh,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_symmetric_pair_splits_mass_evenly(spark):
    ranks = {
        r.node: r.rank
        for r in pagerank(_edges(spark, [("a", "b"), ("b", "a")])).collect()
    }
    assert ranks == {"a": 0.5, "b": 0.5}


def test_pagerank_hub_outranks_leaves(spark):
    # undirected star: hub h <-> leaves x,y,z
    pairs = []
    for leaf in ("x", "y", "z"):
        pairs += [("h", leaf), (leaf, "h")]
    got = {r.node: r.rank for r in pagerank(_edges(spark, pairs)).collect()}
    assert got["h"] > got["x"] == got["y"] == got["z"]
    # total mass stays ~1 (rounding noise only)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_degree_column(spark):
    got = {
        r.node: r.out_deg
        for r in pagerank(
            _edges(spark, [("h", "x"), ("x", "h"), ("h", "y"), ("y", "h")])
        ).collect()
    }
    assert got == {"h": 2, "x": 1, "y": 1}


def test_pagerank_materializes_edges_once(spark, sf_dir):
    """VERDICT r3 #2: the expensive upstream join (lineitem⋈orders) must
    be computed exactly once — the returned plan's consumers (degrees,
    nodes, every iteration) read the materialized edge table, so the base
    fact tables appear ZERO times in the final plan (their single scan
    happened eagerly at materialize time)."""
    from audience_manager_platform_spark.operators.graph import (
        pagerank_customer_supplier,
    )

    df = pagerank_customer_supplier(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "lineitem" not in plan and "orders" not in plan, (
        "fact tables re-derived in the iteration plan instead of reading "
        "the materialized edge list"
    )
    assert df.limit(1).count() == 1  # still executes


def _events_df(spark):
    rows = [
        (i, datetime(2024, 1, 1 + (i % 10), 9 + (i % 12)), i % 7,
         ["view", "click", "purchase"][i % 3], float(i % 50) / 2)
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_incremental_refresh_equals_full_for_any_split(spark):
    ev = _events_df(spark)
    full = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in daily_rollup(ev).collect()
    }
    for cut in (3, 6, 9):
        old = ev.filter(F.dayofmonth("ts") <= cut)
        delta = ev.filter(F.dayofmonth("ts") > cut)
        got = {
            (r.day, r.event_type): (r.n_events, r.total_value)
            for r in incremental_rollup_refresh(
                daily_rollup(old), ev, delta
            ).collect()
        }
        assert got == full, f"cut={cut}"


def test_incremental_refresh_cold_start_and_overlap(spark):
    ev = _events_df(spark)
    full = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in daily_rollup(ev).collect()
    }
    # cold start: no previous rollup
    got = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in incremental_rollup_refresh(None, ev, ev).collect()
    }
    assert got == full
    # churn that OVERLAPS days already in prev: recompute must replace,
    # not double-count
    prev = daily_rollup(ev.filter(F.dayofmonth("ts") <= 8))
    delta = ev.filter(F.dayofmonth("ts").between(5, 10))
    got = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in incremental_rollup_refresh(prev, ev, delta).collect()
    }
    assert got == full


def test_incremental_refresh_null_day_churn(spark):
    """A delta row with ts = NULL churns the NULL-day group: the refresh
    must recompute it from base (null-safe joins), not carry a stale
    row. Review finding r3."""
    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9), 1, "view", 2.0),
         (2, None, 1, "view", 5.0),
         (3, None, 2, "click", 7.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    full = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in daily_rollup(ev).collect()
    }
    prev = daily_rollup(ev.filter(F.col("event_id") == 1).union(
        ev.filter(F.col("event_id") == 2)))
    delta = ev.filter(F.col("event_id") == 3)  # NULL-day churn
    got = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in incremental_rollup_refresh(prev, ev, delta).collect()
    }
    assert got == full


def test_pagerank_rejects_dangling_nodes(spark):
    import pytest

    with pytest.raises(ValueError, match="dangling"):
        pagerank(_edges(spark, [("a", "b")]))
