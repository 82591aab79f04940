"""Temporal-operator scale smoke: sessionize + session_stats, asof_join,
and range_join over an executor-side synthetic event stream — the first
measured datums for the round-6 temporal tier (the 100 TB notes assert
the plan shapes; this measures them).

Event model: ``users`` users with uniform traffic plus ONE hot user
carrying ``hot_frac`` of all events (the documented as-of/sessionize
skew boundary made concrete — the hot key serializes into one task).
Timestamps are seconds-spaced per user so sessions break naturally at
the 1-hour gap; ~1/3 of events are 'click', ~1/3 'view'.

Stages measured:
  sessionize_s  — sessionize + session_stats rollup (ONE user-keyed
                  exchange), count of sessions
  asof_s        — asof_join of all clicks to latest same-user view
                  (union + last(struct) single window), count
  range_s       — range_join of every event into its user's session
                  [min, max] bounds (bucketed equality join), count

Usage: python tools/temporal_smoke.py [n_events] [users] [hot_frac]
Prints one JSON line with per-stage seconds.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def synth_events(spark, n: int, users: int, hot_frac: float):
    """Deterministic executor-side events; row i of the hot user's
    stream is i, the rest spread uniformly over the other users."""
    i = F.col("id")
    hot_n = int(n * hot_frac)
    user = F.when(i < hot_n, F.lit(0)).otherwise(
        (F.pmod(F.xxhash64(i, F.lit("u")), users - 1) + 1)
    )
    # per-user local sequence number drives the timeline: uniform users
    # emit every ~240 s (sessions of ~15 events at the 1 h gap via a
    # planted long pause every 16th event), the hot user every 2 s
    seq = F.when(i < hot_n, i).otherwise(
        F.floor((i - hot_n) / F.lit(max(1, users - 1))).cast("long")
    )
    # every 16th event the user pauses 7200 s (> gap => new session);
    # the pause is CUMULATIVE — all later events shift with it
    step = F.when(i < hot_n, F.lit(2)).otherwise(F.lit(240))
    ts = F.timestamp_seconds(
        F.lit(1_700_000_000)
        + seq * step
        + F.lit(7200) * F.floor(seq / 16).cast("long")
    )
    etype = F.element_at(
        F.array(F.lit("click"), F.lit("view"), F.lit("other")),
        (F.pmod(F.xxhash64(i, F.lit("t")), 3) + 1).cast("int"),
    )
    return spark.range(n).select(
        i.alias("event_id"),
        user.alias("user_id"),
        ts.alias("ts"),
        etype.alias("event_type"),
        (F.pmod(F.xxhash64(i, F.lit("v")), 1000) / 10.0).alias("value"),
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    users = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.02

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("temporal_smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.operators.stats import session_stats, sessionize
    from fabstir_vectordb_spark.operators.temporal import asof_join, range_join

    ev = synth_events(spark, n, users, hot_frac)
    out: dict[str, float | int] = {
        "n_events": n, "users": users, "hot_frac": hot_frac,
    }

    _log("sessionize + rollup ...")
    t0 = time.time()
    s = sessionize(ev, gap_seconds=3600)
    n_sessions = session_stats(s).count()
    out["sessionize_s"] = round(time.time() - t0, 1)
    out["sessions"] = n_sessions

    _log("asof_join clicks -> views ...")
    t0 = time.time()
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    a = asof_join(
        clicks, views, on="user_id", value_cols=["event_id", "value"],
        tolerance_seconds=7200, right_order_col="event_id",
    )
    # count MATCHED rows, not rows: a bare count() lets Catalyst prune
    # the last(struct) window entirely (the cardinality doesn't depend
    # on it) and times a gutted plan
    out["asof_matched"] = a.filter(F.col("ts_r").isNotNull()).count()
    out["asof_s"] = round(time.time() - t0, 1)

    _log("range_join events -> session bounds ...")
    t0 = time.time()
    bounds = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("start"), F.max("ts").alias("end")
    )
    r = range_join(ev, bounds, on="user_id", bucket_seconds=3600)
    out["range_rows"] = r.count()
    out["range_s"] = round(time.time() - t0, 1)
    # same-user sessions are disjoint and every event is in one =>
    # the range join must reproduce the event count exactly
    out["range_ok"] = bool(out["range_rows"] == n)

    print(json.dumps(out))
    return 0 if out["range_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
