"""Round-9 datums for the two new extension operators.

1. resample hot-key compaction: 10M events in ONE key over 30 days.
   The grid is span/step rows (720 hourly buckets), so the per-key
   window pass that would straggle in a raw-event formulation runs
   over 720 rows; the job is bounded by the map-side partial agg.

2. grouped_report two-phase vs direct: 10M rows x 3 dims CUBE
   (2^3 = 8 grouping sets).  Direct: Expand replicates the scan 8x
   (80M rows into the shuffle).  Two-phase: exact groupBy first
   (distinct combos only), Expand over the compact frame.

Run: python tools/olap_timeseries_datum.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.olap import grouped_report
from fabstir_vectordb_spark.operators.timeseries import resample

N = 10_000_000

s = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
s.sparkContext.setLogLevel("ERROR")

# ---- 1. resample: one pathological key, 10M events in 30 days ----
ev = s.range(N).select(
    F.lit(1).alias("k"),
    F.timestamp_micros(
        F.lit(1_700_000_000_000_000)
        + (F.xxhash64("id") % (30 * 86_400_000_000))
    ).alias("ts"),
    (F.col("id") % 1000).cast("double").alias("value"),
)
t0 = time.time()
out = resample(
    ev, "k", "ts", 3600,
    aggs={"n": F.count(F.lit(1)), "v": F.avg("value")},
    fill={"v": ("locf", "interp")},
)
rows = out.count()
t_rs = time.time() - t0
print(f"resample hot-key: {N:,} events ONE key -> {rows} grid rows "
      f"(compaction {N // max(rows, 1):,}x), wall {t_rs:.2f}s")

# ---- 2. grouped_report: CUBE over 3 dims, 10M rows ----
# MATERIALIZED to parquet first, so the timing measures the reports
# (scan + Expand + aggregate), not the synthetic row generation that
# would otherwise dominate both cells equally and mask the gap
import tempfile

fact_path = tempfile.mkdtemp(prefix="olap_datum_") + "/fact"
s.range(N).select(
    (F.col("id") % 5).cast("string").alias("a"),
    (F.col("id") % 20).cast("string").alias("b"),
    (F.col("id") % 10).cast("string").alias("c"),
    (F.col("id") % 997).cast("double").alias("x"),
).write.mode("overwrite").parquet(fact_path)
fact = s.read.parquet(fact_path)
fact.count()  # warm the scan once
ms = {"n": ("count", None), "sx": ("sum", "x"), "mx": ("max", "x")}
# ALTERNATE the two variants and keep the median of 3: back-to-back
# same-variant runs inherit whatever GC/page-cache state the previous
# block left, which can swing a 1-2 s job by several x
import statistics

res = {"direct": [], "two_phase": []}
for _ in range(3):
    for label, pre in (("direct", False), ("two_phase", True)):
        t0 = time.time()
        cnt = grouped_report(
            fact, ["a", "b", "c"], ms, mode="cube", pre_aggregate=pre
        ).count()
        res[label].append(time.time() - t0)
med = {k: statistics.median(v) for k, v in res.items()}
for label in ("direct", "two_phase"):
    print(f"cube {label}: {cnt} report rows, "
          f"median {med[label]:.2f}s of {[round(t, 2) for t in res[label]]}")
print(f"two-phase speedup: {med['direct'] / med['two_phase']:.2f}x "
      f"(Expand input: {N:,} rows direct vs distinct combos two-phase)")
