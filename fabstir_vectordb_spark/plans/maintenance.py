"""Recent→historical migration scheduling — the maintenance half of the
reference's hybrid index (src/hybrid/maintenance.rs:286-463: run
interval, max-migrations-per-run, quiet-hours window; the migration
batches themselves are hybrid/core.rs:551-649, batch_size=100).

In this engine recent-vs-historical is an age predicate evaluated at
query time (SURVEY §2 row 39), so migration is never REQUIRED for
correctness — search results are identical whether or not maintenance
has run (a strictly stronger property than the reference, where a
lagging migration changes which index serves a vector).  What migration
buys at scale is PHYSICAL layout: flipping aged rows' `tier` marks them
for the clustered (partition-pruned) historical store at the next
save()/compaction, while the recent delta stays a small fast-append
table — the OPTIMIZE job of a merge-on-read table.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass


def _utcnow() -> _dt.datetime:
    return _dt.datetime.now(_dt.timezone.utc)


@dataclass(frozen=True)
class MaintenanceConfig:
    """interval/max_per_run/quiet_hours — maintenance.rs:286-463.

    ``quiet_hours=(start, end)``: UTC hours during which maintenance must
    NOT run; a wrapped window like (22, 6) means 22:00→06:00."""

    interval: _dt.timedelta = _dt.timedelta(hours=1)
    max_per_run: int = 100
    quiet_hours: tuple[int, int] | None = None

    def in_quiet_hours(self, now: _dt.datetime) -> bool:
        if self.quiet_hours is None:
            return False
        start, end = self.quiet_hours
        h = now.hour
        if start <= end:
            return start <= h < end
        return h >= start or h < end  # wrapped window

    def should_run(self, now: _dt.datetime, last_run: _dt.datetime | None) -> bool:
        if self.in_quiet_hours(now):
            return False
        return last_run is None or (now - last_run) >= self.interval


class MaintenanceScheduler:
    """Drives ``session.migrate_aged`` on the configured cadence.  Pass
    ``now`` explicitly for deterministic tests (and because a real
    deployment runs tick() from its own scheduler — cron, Airflow, a
    Structured Streaming trigger — not from a thread here)."""

    def __init__(self, session, config: MaintenanceConfig | None = None):
        self.session = session
        self.config = config or MaintenanceConfig()
        self.last_run: _dt.datetime | None = None
        self.total_migrated = 0
        self.runs = 0

    def tick(self, now: _dt.datetime | None = None) -> dict:
        now = now or _utcnow()
        if not self.config.should_run(now, self.last_run):
            return {"ran": False, "migrated": 0}
        res = self.session.migrate_aged(
            max_per_run=self.config.max_per_run, now=now
        )
        self.last_run = now
        self.runs += 1
        self.total_migrated += res["migrated"]
        return {"ran": True, **res}

    def stats(self) -> dict:
        """maintenance.rs exposes scheduler counters; same shape."""
        return {
            "runs": self.runs,
            "total_migrated": self.total_migrated,
            "last_run": self.last_run,
        }
