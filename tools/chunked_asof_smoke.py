"""Degenerate hot-key as-of datum: ONE key holding every row.

The plain union+window as-of serializes each key in one task, so a
single key owning the whole table is the worst case the chunk_seconds
escape hatch exists for (operators/temporal.py asof_join).  This datum
runs both plans on a 10^6-row single-key fixture and checks they agree
by full-result checksum (NOT count() — Catalyst prunes the window
under a bare count, the known timing pitfall).

Fixture: 1M left events + 100k right quotes, one user, spread over 30
days (events every ~2.6 s, quotes every ~26 s), so day chunks give 30
parallelizable slices and every chunk's leading rows need the
cross-chunk patch.

Usage: python tools/chunked_asof_smoke.py [n_left] [chunk_seconds] [direction]
Prints one JSON line.  ``direction`` (default backward) also accepts
forward/nearest — round 9 extended the escape hatch to every direction
(the forward patch carries each chunk's earliest OPENING right row).
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
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    chunk_s = int(sys.argv[2]) if len(sys.argv) > 2 else 86_400
    direction = sys.argv[3] if len(sys.argv) > 3 else "backward"

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("chunked_asof_smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.operators.temporal import asof_join

    base = 1_700_000_000
    span = 30 * 86_400  # 30 days
    n_right = max(n_left // 10, 1)
    left = spark.range(n_left).select(
        F.col("id").alias("event_id"),
        F.lit(1).alias("user_id"),
        F.timestamp_seconds(
            F.lit(base) + F.col("id") * span / n_left
        ).alias("ts"),
    ).cache()
    right = spark.range(n_right).select(
        F.lit(1).alias("user_id"),
        # offset by a third of a tick so right never ties a left instant
        F.timestamp_seconds(
            F.lit(base) + F.col("id") * span / n_right + 0.3
        ).alias("ts"),
        (F.col("id") * 7 % 1000).alias("value"),
    ).cache()
    left.count(), right.count()

    def checksum(df) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # pmod keeps the 1M-row hash sum inside a long (ANSI mode
            # overflows on raw 64-bit hash sums)
            F.sum(
                F.pmod(
                    F.xxhash64("event_id", "ts_r", "value_r"),
                    F.lit(1_000_003),
                )
            ).alias("h"),
        ).first()
        return row["n"], row["h"]

    out = {"n_left": n_left, "n_right": n_right, "keys": 1,
           "chunk_seconds": chunk_s, "direction": direction}

    t0 = time.time()
    plain = checksum(
        asof_join(
            left, right, on="user_id", value_cols=["value"],
            direction=direction,
        )
    )
    out["plain_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    chunked = checksum(
        asof_join(
            left, right, on="user_id", value_cols=["value"],
            chunk_seconds=chunk_s, direction=direction,
        )
    )
    out["chunked_s"] = round(time.time() - t0, 1)

    out["match"] = bool(plain == chunked)
    out["rows"] = plain[0]
    out["speedup"] = round(out["plain_s"] / max(out["chunked_s"], 1e-9), 2)
    print(json.dumps(out))
    return 0 if out["match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
