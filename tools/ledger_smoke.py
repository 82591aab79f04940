"""Ledger scale smoke: 10M-fingerprint history x 1M-doc batch with a
HOT duplicate fingerprint (VERDICT r6 ask #7 — the c7ad758 datum covers
the uniform case only; this one plants skew).

Shape under test (sources/ledger.py):
  - history: 10M unique fingerprints committed to a real on-disk
    ledger (partitioned by 1-hex-char prefix);
  - batch: 1M docs where 30% share ONE text (one fingerprint carrying
    300k rows — the in-batch keep-first window's worst key), 20% are
    re-crawls of history docs (must be filtered by the anti-join), and
    50% are genuinely new;
  - measured stages: commit (history build), filter_new on the skewed
    batch (in-batch window + anti-join vs 10M), contains probe.

Correctness checks ride along: survivor count must be exactly
new_docs + 1 (the hot fingerprint keeps exactly its min id), and the
contains probe must flag exactly the re-crawled fraction + committed
survivors as seen.

Usage: python tools/ledger_smoke.py [history_n] [batch_n]
Prints one JSON line with per-stage seconds.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def synth_docs(spark, n: int, kind: str):
    """Deterministic executor-side docs.  kind prefixes the text so the
    history / new populations can't collide by accident."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(kind + " doc text "), F.col("id")).alias("text"),
    )


def main() -> int:
    history_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ledger_smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.sources.ledger import FingerprintLedger

    root = tempfile.mkdtemp(prefix="ledger_smoke_")
    led = FingerprintLedger(spark, str(Path(root) / "led"))
    out: dict[str, float | int] = {"history_n": history_n, "batch_n": batch_n}

    _log(f"committing {history_n:,} history fingerprints ...")
    t0 = time.time()
    led.commit(synth_docs(spark, history_n, "hist"))
    out["commit_history_s"] = round(time.time() - t0, 1)

    # batch: 30% ONE hot text, 20% re-crawls of history, 50% new
    hot_n = batch_n * 3 // 10
    recrawl_n = batch_n * 2 // 10
    new_n = batch_n - hot_n - recrawl_n
    batch = (
        spark.range(hot_n)
        .select(
            (F.col("id") + 2_000_000_000).alias("doc_id"),
            F.lit("hot duplicated boilerplate text").alias("text"),
        )
        .unionByName(synth_docs(spark, recrawl_n, "hist"))
        .unionByName(
            synth_docs(spark, new_n, "new").select(
                (F.col("doc_id") + 3_000_000_000).alias("doc_id"), "text"
            )
        )
    )

    _log(f"filter_new on skewed batch ({hot_n:,} rows on one fp) ...")
    t0 = time.time()
    kept = led.filter_new(batch)
    n_kept = kept.count()
    out["filter_new_s"] = round(time.time() - t0, 1)
    out["kept"] = n_kept
    # survivors: every genuinely-new doc + exactly ONE row of the hot fp
    out["kept_ok"] = bool(n_kept == new_n + 1)

    _log("committing survivors + contains probe ...")
    t0 = time.time()
    led.commit(kept)
    out["commit_batch_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    n_seen = led.contains(batch).filter(F.col("seen")).count()
    out["contains_s"] = round(time.time() - t0, 1)
    # after the commit everything in the batch is history except the
    # hot rows that LOST keep-first... no: the hot fp itself is now
    # committed, so every batch row's fp is in history => all seen
    out["seen"] = n_seen
    out["seen_ok"] = bool(n_seen == batch_n)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    return 0 if out["kept_ok"] and out["seen_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
