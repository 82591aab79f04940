"""Recent→historical migration + maintenance scheduler
(hybrid/core.rs:551-649, src/hybrid/maintenance.rs:286-463)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.plans.maintenance import (
    MaintenanceConfig,
    MaintenanceScheduler,
)
from fabstir_vectordb_spark.session import VectorDbSession

NOW = dt.datetime(2026, 8, 14, 12, 0, 0, tzinfo=dt.timezone.utc)


def _session(spark, n_old=5, n_new=3):
    s = VectorDbSession(spark)
    old_ts = NOW - dt.timedelta(days=30)
    s.add_vectors(
        [{"id": f"old-{i}", "vector": [float(i), 0.0]} for i in range(n_old)],
        timestamp=old_ts,
    )
    s.add_vectors(
        [{"id": f"new-{i}", "vector": [0.0, float(i)]} for i in range(n_new)],
        timestamp=NOW - dt.timedelta(hours=1),
    )
    return s


def test_migrate_aged_batches_oldest_first(spark):
    s = _session(spark, n_old=5, n_new=3)
    r1 = s.migrate_aged(max_per_run=2, now=NOW)
    assert r1 == {"migrated": 2, "remaining_aged": 3}
    r2 = s.migrate_aged(max_per_run=100, now=NOW)
    assert r2 == {"migrated": 3, "remaining_aged": 0}
    # recent rows untouched, tier stamped on migrated rows only
    tiers = {
        r["id"]: r["tier"] for r in s._df.select("id", "tier").collect()
    }
    assert all(tiers[f"old-{i}"] == "historical" for i in range(5))
    assert all(tiers[f"new-{i}"] is None for i in range(3))
    # idempotent once drained
    assert s.migrate_aged(now=NOW) == {"migrated": 0, "remaining_aged": 0}


def test_migrated_events_emitted(spark):
    s = _session(spark, n_old=2, n_new=1)
    s.migrate_aged(now=NOW)
    ev = (
        s.mutation_events()
        .filter(F.col("event_type") == "Migrated")
        .orderBy("seq")
        .collect()
    )
    assert [e["vector_id"] for e in ev] == ["old-0", "old-1"]


def test_migration_does_not_change_search(spark):
    s = _session(spark, n_old=4, n_new=4)
    before = [(r["id"], r["distance"]) for r in s.search([1.0, 1.0], k=5)]
    s.migrate_aged(now=NOW)
    after = [(r["id"], r["distance"]) for r in s.search([1.0, 1.0], k=5)]
    assert before == after


def test_deleted_rows_never_migrate(spark):
    s = _session(spark, n_old=3, n_new=0)
    s.delete_vector("old-1")
    r = s.migrate_aged(now=NOW)
    assert r["migrated"] == 2
    tiers = {r["id"]: r["tier"] for r in s._df.select("id", "tier").collect()}
    assert tiers["old-1"] is None


def test_tier_survives_save_load(spark, tmp_path):
    s = _session(spark, n_old=2, n_new=1)
    s.migrate_aged(now=NOW)
    path = str(tmp_path / "sess")
    s.save(path)
    s2 = VectorDbSession.load(spark, path)
    tiers = {r["id"]: r["tier"] for r in s2._df.select("id", "tier").collect()}
    assert tiers["old-0"] == "historical"
    assert tiers["new-0"] is None
    # migration state is drained in the reloaded session too
    assert s2.migrate_aged(now=NOW) == {"migrated": 0, "remaining_aged": 0}


def test_quiet_hours_and_interval():
    cfg = MaintenanceConfig(
        interval=dt.timedelta(hours=1), quiet_hours=(22, 6)
    )
    assert cfg.in_quiet_hours(NOW.replace(hour=23))
    assert cfg.in_quiet_hours(NOW.replace(hour=3))
    assert not cfg.in_quiet_hours(NOW.replace(hour=12))
    # wrapped boundary: start inclusive, end exclusive
    assert cfg.in_quiet_hours(NOW.replace(hour=22))
    assert not cfg.in_quiet_hours(NOW.replace(hour=6))
    assert cfg.should_run(NOW, None)
    assert not cfg.should_run(NOW, NOW - dt.timedelta(minutes=30))
    assert cfg.should_run(NOW, NOW - dt.timedelta(hours=2))
    assert not cfg.should_run(NOW.replace(hour=23), None)


def test_scheduler_tick(spark):
    s = _session(spark, n_old=5, n_new=1)
    sched = MaintenanceScheduler(
        s, MaintenanceConfig(interval=dt.timedelta(hours=1), max_per_run=3)
    )
    r = sched.tick(NOW)
    assert r["ran"] and r["migrated"] == 3
    # within the interval: no-op
    assert sched.tick(NOW + dt.timedelta(minutes=10)) == {
        "ran": False,
        "migrated": 0,
    }
    r = sched.tick(NOW + dt.timedelta(hours=2))
    assert r["ran"] and r["migrated"] == 2
    st = sched.stats()
    assert st["runs"] == 2 and st["total_migrated"] == 5


def test_empty_session_migrate(spark):
    s = VectorDbSession(spark)
    assert s.migrate_aged(now=NOW) == {"migrated": 0, "remaining_aged": 0}
