"""Semantics of the time-series resampling family on hand-built frames
(the oracle gate covers fixture-scale equivalence; these pin the edge
rules: carry, no-extrapolation, blend arithmetic, candle picks)."""

from datetime import date, datetime

from pyspark.sql import functions as F

from audience_manager_platform_spark.operators import timeseries as TS


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_locf_carries_and_leading_nulls(spark):
    ev = _ev(
        spark,
        [
            (1, datetime(2024, 1, 1, 9), 1, 10.0),
            (2, datetime(2024, 1, 4, 9), 1, 40.0),
            # user 2 starts later: days before stay NULL
            (3, datetime(2024, 1, 3, 9), 2, 7.0),
        ],
    )
    got = {
        (r.user_id, r.day): (r.value_filled, r.is_observed)
        for r in TS.resample_locf(ev).collect()
    }
    # span is global: 2024-01-01 .. 2024-01-04 for both users
    assert len(got) == 8
    assert got[(1, "2024-01-02")] == (10.0, False)  # carried
    assert got[(1, "2024-01-03")] == (10.0, False)
    assert got[(1, "2024-01-04")] == (40.0, True)
    assert got[(2, "2024-01-01")] == (None, False)  # before first obs
    assert got[(2, "2024-01-04")] == (7.0, False)


def test_locf_last_event_of_day_wins(spark):
    ev = _ev(
        spark,
        [
            (1, datetime(2024, 1, 1, 9), 1, 10.0),
            (2, datetime(2024, 1, 1, 18), 1, 99.0),  # later ts wins
            (3, datetime(2024, 1, 1, 18), 1, 55.0),  # same ts: higher id wins
        ],
    )
    got = {r.day: r.value_filled for r in TS.resample_locf(ev).collect()}
    assert got == {"2024-01-01": 55.0}


def test_interpolation_blend_and_no_extrapolation(spark):
    ev = _ev(
        spark,
        [
            (1, datetime(2024, 1, 1, 9), 1, 10.0),
            (2, datetime(2024, 1, 5, 9), 1, 50.0),
            (3, datetime(2024, 1, 2, 9), 2, 1.0),  # widens span to 1/1..1/5
        ],
    )
    got = {
        (r.user_id, r.day): r.value_interp
        for r in TS.interpolate_linear(ev).collect()
    }
    assert got[(1, "2024-01-02")] == 20.0
    assert got[(1, "2024-01-03")] == 30.0
    assert got[(1, "2024-01-04")] == 40.0
    assert got[(1, "2024-01-05")] == 50.0
    # user 2 has a single observation: nothing before/after is invented
    assert got[(2, "2024-01-01")] is None
    assert got[(2, "2024-01-02")] == 1.0
    assert got[(2, "2024-01-05")] is None


def test_ohlc_picks(spark):
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9), 1, "view", 5.0),
            (2, datetime(2024, 1, 1, 12), 1, "view", 100.0),
            (3, datetime(2024, 1, 1, 23), 1, "view", 2.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = TS.ohlc_daily(ev).collect()[0]
    assert (r.day, r.open, r.high, r.low, r.close, r.n_events) == (
        "2024-01-01",
        5.0,  # open = first event of the day
        100.0,
        2.0,
        2.0,  # close = last event of the day (23h)
        3,
    )


def test_sample_fixed_is_deterministic_and_partition_independent(spark, sf_dir):
    from audience_manager_platform_spark.registry.timeseries import _sample_fixed

    a = [r.event_id for r in _sample_fixed(spark, sf_dir).collect()]
    b = [r.event_id for r in _sample_fixed(spark, sf_dir).collect()]
    assert a == b and len(a) == 100


def test_ewma_exact_blend(spark):
    ev = _ev(
        spark,
        [
            (1, datetime(2024, 1, 1, 9), 1, 1.0),
            (2, datetime(2024, 1, 2, 9), 1, 2.0),
            (3, datetime(2024, 1, 3, 9), 1, 4.0),
        ],
    )
    got = {r.day: (r.value, r.ewma) for r in TS.ewma_smooth(ev).collect()}
    assert got["2024-01-01"] == (1.0, 1.0)
    # (2 + 0.5*1) / 1.5
    assert got["2024-01-02"] == (2.0, round(2.5 / 1.5, 6))
    # (4 + 0.5*2 + 0.25*1) / 1.75
    assert got["2024-01-03"] == (4.0, 3.0)


def test_table_diff_classifies(spark):
    from audience_manager_platform_spark.operators.reconcile import table_diff

    old = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, 20.0), ("c", 3, 30.0)],
        "k string, n long, v double",
    )
    new = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, 25.0), ("d", 4, 40.0)],
        "k string, n long, v double",
    )
    got = {r.k: r.change for r in table_diff(old, new, ["k"], ["n", "v"]).collect()}
    # 'a' unchanged -> absent from the delta
    assert got == {"b": "changed", "c": "removed", "d": "added"}


def test_forget_users_counts_and_nulls(spark):
    from audience_manager_platform_spark.operators.reconcile import forget_users

    ev = spark.createDataFrame(
        [(1, 1, "view"), (2, 7, "view"), (3, 2, "click"), (4, None, "click")],
        "event_id long, user_id long, event_type string",
    )
    got = {
        r.event_type: (r.purged_rows, r.surviving_rows)
        for r in forget_users(ev, [1, 7]).collect()
    }
    # null user_id is never purged (no identity to forget)
    assert got == {"view": (2, 0), "click": (0, 2)}


def test_table_diff_null_keys_pair_up(spark):
    """NULL keys are real values in a diff: a NULL-key row present in
    both snapshots with equal payload is NOT a change; present only in
    old it is 'removed' (not 'added'). Review finding r3."""
    from audience_manager_platform_spark.operators.reconcile import table_diff

    old = spark.createDataFrame([(None, 1), ("b", 2)], "k string, n long")
    new = spark.createDataFrame([(None, 1), ("c", 3)], "k string, n long")
    got = sorted(
        (r.k, r.change) for r in table_diff(old, new, ["k"], ["n"]).collect()
    )
    assert got == [("b", "removed"), ("c", "added")]
    # old-only NULL key classifies as removed
    got2 = {
        (r.k, r.change)
        for r in table_diff(
            spark.createDataFrame([(None, 1)], "k string, n long"),
            spark.createDataFrame([], "k string, n long"),
            ["k"], ["n"],
        ).collect()
    }
    assert got2 == {(None, "removed")}
