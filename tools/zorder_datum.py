"""Round-9 datum: z-order layout vs single-column sort vs unsorted,
10M rows x 2 uncorrelated dims, measured two ways:

  1. footer pruning (zorder_stats): how many of the files a range
     predicate on EACH column could skip on min/max stats — the
     engine-independent layout-quality number;
  2. filtered-scan wall: count(*) under a 2% range predicate per
     column, alternated, median-of-3 (see PERFORMANCE.md's datum
     discipline — back-to-back same-variant runs mislead).

Run: python tools/zorder_datum.py
"""

import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fabstir_vectordb_spark.sources.layout import zorder_stats, zorder_write

N = 10_000_000
FILES = 64

s = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
s.sparkContext.setLogLevel("ERROR")

base = tempfile.mkdtemp(prefix="zorder_datum_")
big = s.range(N).select(
    (F.col("id") % 10_000).alias("x"),
    ((F.col("id") * 7919) % 10_000).alias("y"),
    F.col("id").alias("payload"),
)

zorder_write(big, f"{base}/zorder", ["x", "y"], target_files=FILES)
(
    big.repartitionByRange(FILES, "x").sortWithinPartitions("x")
    .write.mode("overwrite").parquet(f"{base}/xsort")
)
big.repartition(FILES).write.mode("overwrite").parquet(f"{base}/shuffled")

pred = {"x": (4000, 4200), "y": (7000, 7200)}  # 2% ranges
for layout in ("zorder", "xsort", "shuffled"):
    st = zorder_stats(f"{base}/{layout}", pred)
    print(f"{layout:9s} footer pruning: "
          + ", ".join(f"{c}: {v['prunable']}/{v['files']} files skippable"
                      for c, v in st.items()))

frames = {l: s.read.parquet(f"{base}/{l}") for l in ("zorder", "xsort",
                                                     "shuffled")}
for f in frames.values():
    f.count()  # warm
walls = {l: {"x": [], "y": []} for l in frames}
for _ in range(3):
    for l, f in frames.items():
        for c in ("x", "y"):
            lo, hi = pred[c]
            t0 = time.time()
            f.filter(F.col(c).between(lo, hi)).agg(F.sum("payload")).first()
            walls[l][c].append(time.time() - t0)
for l in frames:
    m = {c: statistics.median(v) for c, v in walls[l].items()}
    print(f"{l:9s} filtered-scan median: x {m['x']:.2f}s, y {m['y']:.2f}s "
          f"(of {[[round(t, 2) for t in walls[l][c]] for c in ('x', 'y')]})")
