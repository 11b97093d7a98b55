"""M4 scheduling semantics with an injected clock."""

from datetime import datetime, timedelta, timezone

import pytest

from audience_manager_platform_spark.catalog import Catalog
from audience_manager_platform_spark.engine import AudienceEngine
from audience_manager_platform_spark.scheduler import Scheduler, SchedulerDaemon
from audience_manager_platform_spark.sources import (
    load_table,
    unified_transactions_from_events,
)

AMT = {"field": "transaction_amount", "operator": ">", "value": "120"}


@pytest.fixture()
def scheduler(spark, sf_dir, tmp_path):
    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    engine = AudienceEngine(spark, Catalog(str(tmp_path / "cat")), lambda: txns)
    return Scheduler(engine)


def test_once_runs_exactly_once(scheduler):
    rule = scheduler.engine.create_rule("r_once", [AMT], schedule="ONCE")
    now = datetime.now(timezone.utc)
    first = scheduler.run_due(now)
    assert rule.rule_id in first
    again = scheduler.run_due(now + timedelta(days=30))
    assert rule.rule_id not in again


def test_hourly_cadence(scheduler):
    rule = scheduler.engine.create_rule("r_hourly", [AMT], schedule="HOURLY")
    t0 = datetime.now(timezone.utc)
    assert rule.rule_id in scheduler.run_due(t0)
    # 30 minutes later: not due
    assert rule.rule_id not in scheduler.run_due(t0 + timedelta(minutes=30))
    # 61 minutes after the RUN (run_due stamps last_run_at at execution)
    assert rule.rule_id in scheduler.run_due(t0 + timedelta(minutes=61))


def test_dependents_refresh_after_parents(scheduler):
    eng = scheduler.engine
    r1 = eng.create_rule("p1", [AMT], schedule="DAILY")
    r2 = eng.create_rule(
        "child",
        [AMT, {"field": "transaction_count", "operator": ">=", "value": 5}],
        schedule="DAILY",
    )
    assert r2.depends_on == [r1.rule_id]
    ran = scheduler.run_due(datetime.now(timezone.utc))
    order = list(ran)
    assert order.index(r1.rule_id) < order.index(r2.rule_id)


def test_daemon_cadence_refires_and_stamps_next_run(scheduler):
    """The wall-clock loop (reference: APScheduler background thread)
    re-fires HOURLY/DAILY/WEEKLY rules as virtual time advances and every
    run restamps next_run_at = last_run + cadence."""
    eng = scheduler.engine
    hourly = eng.create_rule("d_hourly", [AMT], schedule="HOURLY")
    daily = eng.create_rule(
        "d_daily",
        [{"field": "transaction_amount", "operator": ">", "value": "200"}],
        schedule="DAILY",
    )
    weekly = eng.create_rule(
        "d_weekly",
        [{"field": "transaction_amount", "operator": ">", "value": "300"}],
        schedule="WEEKLY",
    )
    t0 = datetime.now(timezone.utc)
    vnow = [t0]
    daemon = SchedulerDaemon(
        scheduler,
        poll_seconds=86400.0,  # daily ticks keep the test to ~24 refreshes
        clock=lambda: vnow[0],
        sleep=lambda s: vnow.__setitem__(0, vnow[0] + timedelta(seconds=s)),
    )
    # 1 week of daily ticks, synchronously (sleep advances virtual time)
    daemon.run(max_ticks=8)
    runs = {rid: sum(1 for r in daemon.tick_results if rid in r)
            for rid in (hourly.rule_id, daily.rule_id, weekly.rule_id)}
    assert runs[hourly.rule_id] == 8  # due on every daily tick
    assert runs[daily.rule_id] == 8
    assert runs[weekly.rule_id] == 2  # t0 and the day-7 tick
    # next_run_at stamped = cadence past the (real-clock) run stamp
    for rule_id, delta in (
        (hourly.rule_id, timedelta(hours=1)),
        (daily.rule_id, timedelta(days=1)),
        (weekly.rule_id, timedelta(weeks=1)),
    ):
        r = eng.catalog.get_rule(rule_id)
        last = datetime.strptime(r.last_run_at, "%Y-%m-%dT%H:%M:%S.%fZ")
        nxt = datetime.strptime(r.next_run_at, "%Y-%m-%dT%H:%M:%S.%fZ")
        assert nxt - last == delta


def test_daemon_background_thread_start_stop(scheduler):
    """start()/stop() lifecycle: the thread ticks at least once and
    terminates promptly on stop()."""
    eng = scheduler.engine
    eng.create_rule("bg_once", [AMT], schedule="ONCE")
    daemon = SchedulerDaemon(scheduler, poll_seconds=0.05)
    t = daemon.start()
    for _ in range(200):
        if daemon.tick_results:
            break
        t.join(0.1)
    daemon.stop()
    assert not t.is_alive()
    assert daemon.tick_results and daemon.tick_results[0]


def test_once_next_run_is_none(scheduler):
    rule = scheduler.engine.create_rule("n_once", [AMT], schedule="ONCE")
    scheduler.run_due(datetime.now(timezone.utc))
    assert scheduler.engine.catalog.get_rule(rule.rule_id).next_run_at is None


def test_unknown_schedule_rejected(scheduler):
    rule = scheduler.engine.catalog.add_rule("bad", [AMT], schedule="SOMETIMES")
    with pytest.raises(ValueError, match="unknown schedule"):
        scheduler.is_due(rule, datetime.now(timezone.utc))
