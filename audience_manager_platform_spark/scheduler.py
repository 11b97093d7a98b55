"""Refresh scheduling (M4): the reference drives rule refresh with
APScheduler date-triggers per rule (ONCE/HOURLY/DAILY/WEEKLY,
``backend/app/core/scheduler.py:45-60,140-150``), each spawning a cold
spark-submit subprocess.

Two layers here:

- :class:`Scheduler` — pure cadence logic over catalog metadata with an
  injected clock: ``run_due`` executes every due rule dependency-ordered
  inside the long-lived session (parents always refresh before
  dependents — the reference can serve a child from stale parents when
  triggers interleave).
- :class:`SchedulerDaemon` — the wall-clock loop the reference's
  APScheduler background thread provides: wakes every ``poll_seconds``,
  calls ``run_due``, and keeps going until ``stop()``. Clock and sleep
  are injectable so tests drive virtual time; production just calls
  ``start()``.

``next_run_at`` is stamped by ``Catalog.mark_run`` on every successful
materialization (last_run + cadence, None for ONCE), mirroring the
reference's trigger bookkeeping.
"""

from __future__ import annotations

import threading
from datetime import datetime, timezone
from typing import Callable

from .catalog import CADENCES
from .engine import AudienceEngine


def _parse(ts: str | None) -> datetime | None:
    if not ts:
        return None
    return datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%fZ").replace(tzinfo=timezone.utc)


class Scheduler:
    def __init__(self, engine: AudienceEngine):
        self.engine = engine

    def is_due(self, rule, now: datetime) -> bool:
        if rule.schedule not in CADENCES:
            raise ValueError(f"unknown schedule {rule.schedule!r}")
        last = _parse(rule.last_run_at)
        if last is None:
            return True  # never ran
        interval = CADENCES[rule.schedule]
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
                results[rid] = self.engine.execute_rule(rid, now=now)
        return results


class SchedulerDaemon:
    """Wall-clock refresh loop (the reference's APScheduler-thread
    counterpart). Each tick runs every due rule; cadence re-fires fall
    out of ``is_due`` (last_run + interval <= now), and ``mark_run``
    restamps ``next_run_at`` after each materialization.

    ``clock`` and ``sleep`` default to real time; tests inject a virtual
    clock and a sleep that advances it, so HOURLY/DAILY/WEEKLY re-runs
    are provable without waiting."""

    def __init__(
        self,
        scheduler: Scheduler,
        poll_seconds: float = 60.0,
        clock: Callable[[], datetime] | None = None,
        sleep: Callable[[float], None] | None = None,
    ):
        self.scheduler = scheduler
        self.poll_seconds = poll_seconds
        self.clock = clock or (lambda: datetime.now(timezone.utc))
        self._stop = threading.Event()
        self._sleep = sleep or (lambda s: self._stop.wait(s))
        self._thread: threading.Thread | None = None
        self.tick_results: list[dict[int, int]] = []

    def tick(self) -> dict[int, int]:
        """One scheduler iteration at the injected clock's now."""
        results = self.scheduler.run_due(self.clock())
        self.tick_results.append(results)
        return results

    def run(self, max_ticks: int | None = None) -> None:
        """The loop body (call directly for deterministic tests, or via
        ``start()`` for a background thread)."""
        ticks = 0
        while not self._stop.is_set():
            self.tick()
            ticks += 1
            if max_ticks is not None and ticks >= max_ticks:
                return
            self._sleep(self.poll_seconds)

    def start(self) -> threading.Thread:
        self._stop.clear()
        self._thread = threading.Thread(
            target=self.run, name="amps-scheduler", daemon=True
        )
        self._thread.start()
        return self._thread

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)
            self._thread = None
