"""Bucketed interval_join vs Spark's native inequality overlap join —
the measured justification mirroring tools/range_join_compare.py.

Fixture: ``users`` keys; each holds ``per_user`` back-to-back 15-minute
left intervals and ``per_user / 8`` two-hour right intervals covering
the same span, so every right interval overlaps exactly 8 lefts (plus
boundary touches) and both plans are verified row-identical.  The
native plan enumerates |L_k| x |R_k| candidate pairs per key before the
overlap filter; the bucketed plan pairs only candidates sharing a time
bucket and keeps each pair in its overlap's first bucket.

Usage: python tools/interval_join_compare.py [users] [per_user]
Prints one JSON line {"native_s": ..., "bucketed_s": ..., ...}.
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
    users = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    per_user = int(sys.argv[2]) if len(sys.argv) > 2 else 8000

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("interval_join_compare")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.operators.temporal import interval_join

    base = 1_700_000_000
    n_l = users * per_user
    left = spark.range(n_l).select(
        F.col("id").alias("lid"),
        (F.col("id") % users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(base) + F.floor(F.col("id") / users) * 900
        ).alias("start"),
        F.timestamp_seconds(
            F.lit(base) + (F.floor(F.col("id") / users) + 1) * 900 - 60
        ).alias("end"),
    ).cache()
    n_r = users * (per_user // 8)
    right = spark.range(n_r).select(
        F.col("id").alias("rid"),
        (F.col("id") % users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(base) + F.floor(F.col("id") / users) * 7200
        ).alias("rstart"),
        F.timestamp_seconds(
            F.lit(base) + (F.floor(F.col("id") / users) + 1) * 7200 - 60
        ).alias("rend"),
    ).cache()
    left.count(), right.count()

    out = {"users": users, "per_user": per_user,
           "left": n_l, "right": n_r}

    t0 = time.time()
    native = left.alias("a").join(
        right.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.start") <= F.col("b.rend"))
        & (F.col("b.rstart") <= F.col("a.end")),
    )
    out["native_rows"] = native.count()
    out["native_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    bucketed = interval_join(
        left, right, on="user_id", bucket_seconds=3600
    )
    out["bucketed_rows"] = bucketed.count()
    out["bucketed_s"] = round(time.time() - t0, 1)

    out["match"] = bool(out["native_rows"] == out["bucketed_rows"])
    out["speedup"] = round(out["native_s"] / max(out["bucketed_s"], 1e-9), 1)
    print(json.dumps(out))
    return 0 if out["match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
