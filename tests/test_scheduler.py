"""M4 scheduling semantics with an injected clock."""

from datetime import datetime, timedelta, timezone

import pytest

from audience_manager_platform_spark.catalog import Catalog
from audience_manager_platform_spark.engine import AudienceEngine
from audience_manager_platform_spark.scheduler import Scheduler
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


def test_unknown_schedule_rejected(scheduler):
    rule = scheduler.engine.catalog.add_rule("bad", [AMT], schedule="SOMETIMES")
    with pytest.raises(ValueError, match="unknown schedule"):
        scheduler.is_due(rule, datetime.now(timezone.utc))
