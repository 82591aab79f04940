"""Round-9 second-wave datums: conversion funnel + incremental rollup.

1. Conversion funnel (operators/funnel.py) at 10M events / 1M users:
   the one-exchange fold's throughput when the step events are a
   sliver of the table (the design case) — only matching events
   shuffle, the fold walks each user's short timeline.  Also a
   single-hot-key variant (10M events, ONE user) to measure the
   stated skew boundary honestly.

2. Incremental rollup refresh (operators/olap.py summarize/merge/
   report_from_summary): a 20-chunk parquet fact; compare a FULL
   grouped_report over all chunks against refreshing with ONE new
   chunk's summary merged into the stored summary of the rest.
   The win is structural (scan 1/20 of the fact + a compact merge),
   so wall-clock ratios here are a floor — at 100 TB the avoided
   scan IS the win.  Variants alternate, median-of-3, parquet fact
   (the olap_timeseries_datum methodology).

Run: python tools/conversion_rollup_datum.py
Prints one JSON line per datum.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.funnel import funnel, funnel_summary
from fabstir_vectordb_spark.operators.olap import (
    grouped_report,
    merge_summaries,
    report_from_summary,
    summarize,
)

N = 10_000_000
M = 40_000_000  # rollup fact rows

s = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
s.sparkContext.setLogLevel("ERROR")


def _events(n_users: int):
    """Executor-side synthetic events: 30 days, numeric-epoch micros,
    ~30% of rows are funnel steps (view/click/purchase at decreasing
    rates), the rest noise the map side must drop before the shuffle."""
    r = F.abs(F.xxhash64("id", F.lit(7)))
    return (
        s.range(N)
        .withColumn("user_id", F.abs(F.xxhash64("id")) % n_users)
        .withColumn(
            "tsu", (F.abs(F.xxhash64("id", F.lit(1))) % (30 * 86400))
            * F.lit(1_000_000)
        )
        .withColumn(
            "et",
            F.when(r % 100 < 18, "view")
            .when(r % 100 < 27, "click")
            .when(r % 100 < 30, "purchase")
            .otherwise("noise"),
        )
        .drop("id")
    )


steps = [F.col("et") == "view", F.col("et") == "click",
         F.col("et") == "purchase"]

out = {}
for label, n_users in (("1m_users", 1_000_000), ("hot_single_key", 1)):
    ev = _events(n_users)
    t0 = time.time()
    per_key = funnel(ev, "user_id", steps, ts_col="tsu",
                     window_seconds=86400 * 1_000_000)
    summ = funnel_summary(per_key, 3).collect()
    wall = time.time() - t0
    out[label] = {
        "wall_s": round(wall, 2),
        "us_per_event": round(wall / N * 1e6, 3),
        "reached": {r["step"]: r["reached"] for r in summ},
    }
print(json.dumps({"datum": "conversion_funnel", "n_events": N, **out}))

# ---- 2. incremental rollup refresh --------------------------------
base = tempfile.mkdtemp(prefix="rollup_fact_")
CHUNKS = 20
fact = (
    s.range(M)
    .withColumn("chunk", (F.col("id") % CHUNKS).cast("int"))
    .withColumn("lang", F.concat(F.lit("l"), (F.abs(F.xxhash64("id")) % 20)))
    .withColumn(
        "source", F.concat(F.lit("s"), (F.abs(F.xxhash64("id", F.lit(2))) % 50))
    )
    .withColumn("n_chars", (F.abs(F.xxhash64("id", F.lit(3))) % 10_000))
    .drop("id")
)
fact.write.mode("overwrite").partitionBy("chunk").parquet(base)
ms = {"n": ("count", None), "chars": ("sum", "n_chars"),
      "mx": ("max", "n_chars")}
dims = ["lang", "source"]

# the stored summary of all prior chunks (built once, as a real
# pipeline would have it on disk already)
stored_path = tempfile.mkdtemp(prefix="rollup_summary_")
prior = s.read.parquet(base).filter(F.col("chunk") < CHUNKS - 1).drop("chunk")
summarize(prior, dims, ms).write.mode("overwrite").parquet(stored_path)


def full():
    rep = grouped_report(
        s.read.parquet(base).drop("chunk"), dims, ms, mode="cube"
    )
    return rep.count()


def incremental():
    delta = s.read.parquet(base).filter(
        F.col("chunk") == CHUNKS - 1
    ).drop("chunk")
    merged = merge_summaries(
        s.read.parquet(stored_path), summarize(delta, dims, ms)
    )
    return report_from_summary(merged, dims, ms, mode="cube").count()


times = {"full": [], "incremental": []}
rows = {}
for rep in range(3):  # alternate variants within each rep
    for name, fn in (("full", full), ("incremental", incremental)):
        t0 = time.time()
        rows[name] = fn()
        times[name].append(time.time() - t0)
assert rows["full"] == rows["incremental"], rows
f_med = statistics.median(times["full"])
i_med = statistics.median(times["incremental"])
n_combos = s.read.parquet(stored_path).count()
print(json.dumps({
    "datum": "incremental_rollup_refresh", "n_rows": M, "chunks": CHUNKS,
    "report_rows": rows["full"],
    "rows_scanned": {"full": M,
                     "incremental": M // CHUNKS + n_combos},
    "full_s": round(f_med, 3), "incremental_s": round(i_med, 3),
    "speedup": round(f_med / i_med, 2),
    "note": "rows_scanned is the honest structural signal (as in "
            "zorder_datum): local wall-clock sits in the page cache; "
            "at 100 TB the avoided scan IS the win",
}))
shutil.rmtree(base, ignore_errors=True)
shutil.rmtree(stored_path, ignore_errors=True)

# ---- 3. bucketed co-located join ----------------------------------
# (appended third wave) 10M x 10M equality join: both sides bucketed
# on the key vs plain parquet.  Locally the shuffle is CPU +
# serialization, not network, so the measured win is a FLOOR — at
# 100 TB the avoided wire transfer dominates.
from fabstir_vectordb_spark.sources.layout import bucketed_write

J = 10_000_000
ja = s.range(J).select(
    F.col("id").alias("k"), (F.col("id") % 97).alias("x")
)
jb = s.range(J).select(
    F.col("id").alias("k"), (F.col("id") % 89).alias("y")
)
plain_base = tempfile.mkdtemp(prefix="join_plain_")
ja.write.mode("overwrite").parquet(plain_base + "/a")
jb.write.mode("overwrite").parquet(plain_base + "/b")
bucket_base = tempfile.mkdtemp(prefix="join_bucket_")
bucketed_write(ja, "dj_a", ["k"], n_buckets=32, path=bucket_base + "/a")
bucketed_write(jb, "dj_b", ["k"], n_buckets=32, path=bucket_base + "/b")


def plain_join():
    a = s.read.parquet(plain_base + "/a")
    b = s.read.parquet(plain_base + "/b")
    return a.hint("merge").join(b, "k").agg(
        F.sum(F.col("x") + F.col("y"))
    ).first()[0]


def bucket_join():
    return s.table("dj_a").hint("merge").join(s.table("dj_b"), "k").agg(
        F.sum(F.col("x") + F.col("y"))
    ).first()[0]


jt = {"plain": [], "bucketed": []}
jv = {}
for rep in range(3):
    for name, fn in (("plain", plain_join), ("bucketed", bucket_join)):
        t0 = time.time()
        jv[name] = fn()
        jt[name].append(time.time() - t0)
assert jv["plain"] == jv["bucketed"], jv
p_med = statistics.median(jt["plain"])
b_med = statistics.median(jt["bucketed"])
print(json.dumps({
    "datum": "bucketed_join", "rows_per_side": J, "buckets": 32,
    "plain_s": round(p_med, 3), "bucketed_s": round(b_med, 3),
    "speedup": round(p_med / b_med, 2),
    "note": "local ratio is a floor: the avoided exchange here is "
            "CPU+serialization only; at cluster scale it is the wire",
}))
s.sql("DROP TABLE IF EXISTS dj_a")
s.sql("DROP TABLE IF EXISTS dj_b")
shutil.rmtree(plain_base, ignore_errors=True)
shutil.rmtree(bucket_base, ignore_errors=True)


# ---- 4. maxsim expr vs kernel --------------------------------------
# (appended) 10M doc tokens x 32 query tokens from materialized
# parquet; the expression path is the certified reference, the Arrow
# GEMM kernel the scale path.
from fabstir_vectordb_spark.operators.multivector import maxsim_topk


def _mv_toks(df, idc):
    return df.select(
        F.col("id").alias(idc),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("token_idx"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(16)),
                    lambda j: (F.hash(F.col("id"), F.lit(i), j) % 1000)
                    .cast("double") / 500.0,
                ).alias("vector"),
            )
            for i in range(4)
        ])).alias("t"),
    ).select(idc, "t.token_idx", "t.vector")


mv_base = tempfile.mkdtemp(prefix="mvtok_")
_mv_toks(s.range(2_500_000), "doc_id").write.mode("overwrite").parquet(mv_base)
mv_docs = s.read.parquet(mv_base)
mv_qs = _mv_toks(s.range(8), "query_id")
mv_t = {}
for rep in range(3):
    for impl in ("expr", "kernel"):
        t0 = time.time()
        maxsim_topk(mv_docs, mv_qs, k=10, impl=impl).count()
        mv_t.setdefault(impl, []).append(time.time() - t0)
e_med = statistics.median(mv_t["expr"])
k_med = statistics.median(mv_t["kernel"])
print(json.dumps({
    "datum": "maxsim_expr_vs_kernel", "doc_tokens": 10_000_000,
    "query_tokens": 32, "expr_s": round(e_med, 2),
    "kernel_s": round(k_med, 2), "speedup": round(e_med / k_med, 2),
}))
shutil.rmtree(mv_base, ignore_errors=True)
