"""Pathological long-lived intervals: the plain bucketed range_join vs
the long_interval_buckets stratified hybrid — the measured
justification for the round-9 skew escape hatch (VERDICT r8 'Next
round' #1).

Fixture: ``users`` keys, each with ``per_user`` points (one per minute)
and per_user/15 back-to-back 15-minute intervals (the well-behaved
bulk), PLUS ``n_long`` OPEN-ENDED intervals per key covering the whole
multi-week span.  At the auto-tuned ~900 s bucket each open-ended
interval explodes to ~(span/bucket) bucket rows — thousands of copies
of one row — while the stratified plan routes it through a plain
key-equality leg (ONE row, no explode) and unions the strata.

Both plans must produce identical results (asserted on counts here;
the property suite asserts exact equality on random inputs).

Usage: python tools/long_interval_compare.py [users] [per_user] [n_long]
Prints one JSON line:
  {"plain_s", "hybrid_s", "explode_rows_plain", "explode_rows_hybrid",
   "rows", "speedup"}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    users = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    per_user = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    n_long = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("long_interval_compare")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.operators.temporal import range_join

    t0 = 1_700_000_000  # epoch seconds
    pts = (
        spark.range(users * per_user)
        .select(
            F.col("id").alias("pid"),
            (F.col("id") % users).alias("user_id"),
            F.timestamp_seconds(
                t0 + (F.col("id") / users).cast("long") * 60
            ).alias("ts"),
        )
    )
    n_iv = per_user // 15
    short_iv = (
        spark.range(users * n_iv)
        .select(
            F.col("id").alias("iid"),
            (F.col("id") % users).alias("user_id"),
            F.timestamp_seconds(
                t0 + (F.col("id") / users).cast("long") * 900
            ).alias("start"),
            F.timestamp_seconds(
                t0 + (F.col("id") / users).cast("long") * 900 + 899
            ).alias("end"),
        )
    )
    # open-ended in the practical sense: a year-long validity window, far
    # past the point timeline — the classic "no expiry recorded" row
    long_span = 365 * 86_400
    long_iv = (
        spark.range(users * n_long)
        .select(
            (F.col("id") + 10_000_000).alias("iid"),
            (F.col("id") % users).alias("user_id"),
            F.timestamp_seconds(F.lit(t0)).alias("start"),
            F.timestamp_seconds(F.lit(t0 + long_span)).alias("end"),
        )
    )
    ivs = short_iv.unionByName(long_iv)

    bucket = 900  # the tuner's pick for this corpus (median length 900)

    def explode_rows(intervals, threshold):
        """Bucket rows the interval side emits — the replication datum."""
        us = lambda c: F.unix_micros(F.col(c))
        b_us = bucket * 1_000_000
        span = F.floor(us("end") / b_us) - F.floor(us("start") / b_us)
        kept = intervals if threshold is None else intervals.filter(
            span <= threshold
        )
        n = kept.select(
            F.sum(
                F.floor(us("end") / b_us) - F.floor(us("start") / b_us) + 1
            ).alias("n")
        ).first()["n"]
        extra = 0 if threshold is None else intervals.filter(
            span > threshold
        ).count()
        return int(n or 0) + extra

    def run(threshold):
        out = range_join(
            pts, ivs, on="user_id", bucket_seconds=bucket,
            long_interval_buckets=threshold,
        )
        t = time.monotonic()
        rows = out.count()
        return time.monotonic() - t, rows

    # warm both paths once, then time
    run(None), run(64)
    plain_s, rows_plain = run(None)
    hybrid_s, rows_hybrid = run(64)
    assert rows_plain == rows_hybrid, (rows_plain, rows_hybrid)

    print(
        json.dumps(
            {
                "users": users,
                "per_user": per_user,
                "n_long": n_long,
                "bucket_seconds": bucket,
                "rows": rows_plain,
                "explode_rows_plain": explode_rows(ivs, None),
                "explode_rows_hybrid": explode_rows(ivs, 64),
                "plain_s": round(plain_s, 3),
                "hybrid_s": round(hybrid_s, 3),
                "speedup": round(plain_s / max(hybrid_s, 1e-9), 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
