"""Refresh scheduling (M4): the reference drives rule refresh with
APScheduler date-triggers per rule (ONCE/HOURLY/DAILY/WEEKLY,
``backend/app/core/scheduler.py:45-60,140-150``), each spawning a cold
spark-submit subprocess.

Here scheduling is a thin driver loop over catalog metadata: due rules run
dependency-ordered inside the long-lived session (parents always refresh
before dependents — the reference can serve a child from stale parents
when triggers interleave). The clock is injected for testability; wire
``run_due`` to cron/Airflow/a sleep loop in production.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from .engine import AudienceEngine

_INTERVALS = {
    "ONCE": None,
    "HOURLY": timedelta(hours=1),
    "DAILY": timedelta(days=1),
    "WEEKLY": timedelta(weeks=1),
}


def _parse(ts: str | None) -> datetime | None:
    if not ts:
        return None
    return datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%fZ").replace(tzinfo=timezone.utc)


class Scheduler:
    def __init__(self, engine: AudienceEngine):
        self.engine = engine

    def is_due(self, rule, now: datetime) -> bool:
        if rule.schedule not in _INTERVALS:
            raise ValueError(f"unknown schedule {rule.schedule!r}")
        last = _parse(rule.last_run_at)
        if last is None:
            return True  # never ran
        interval = _INTERVALS[rule.schedule]
        if interval is None:
            return False  # ONCE already ran
        return now - last >= interval

    def run_due(self, now: datetime | None = None) -> dict[int, int]:
        """Execute every due rule in dependency (topological) order; a
        dependent due rule therefore reads freshly-written parents.
        Returns {rule_id: row_count} for the rules that ran."""
        now = now or datetime.now(timezone.utc)
        due = {
            r.rule_id
            for r in self.engine.catalog.active_rules()
            if self.is_due(r, now)
        }
        results: dict[int, int] = {}
        for rid in self.engine.catalog.topological_order():
            if rid in due:
                results[rid] = self.engine.execute_rule(rid)
        return results
