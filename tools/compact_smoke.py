"""HNSW compaction scale smoke: build N-vector partition-local graphs,
tombstone half the nodes inside a quarter of the graphs, compact, and
report build vs compact wall-clock — the claim under measurement is
that compaction cost tracks the TOMBSTONE MASS (only graphs over the
threshold rebuild), not the corpus.

Usage: python tools/compact_smoke.py [n_vectors]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_vectors(spark, n: int, dim: int = 32):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.xxhash64(F.col("id"), i) % 1000).cast("float") / 1000.0,
        ).alias("embedding"),
    )


def main() -> int:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("compact_smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.operators.hnsw import HNSWIndex

    vec = synth_vectors(spark, n_vec).repartition(64).cache()
    vec.count()
    idx = HNSWIndex(
        M=16, M0=32, ef_construction=100,
        id_col="vec_id", vector_col="embedding",
    )

    t0 = time.time()
    graph = idx.build(vec).localCheckpoint(eager=True)
    build_s = time.time() - t0
    g = int(idx.num_graphs)

    # tombstone half the nodes of a quarter of the graphs — the other
    # three quarters stay below any threshold and must not rebuild
    tomb = graph.withColumn(
        "deleted",
        (F.pmod("graph_id", 4) == 0) & (F.pmod("id", 2) == 0),
    ).localCheckpoint(eager=True)

    t0 = time.time()
    compacted = idx.compact_graph(tomb, min_deleted_fraction=0.3)
    n_after = compacted.count()  # materialize the rebuild
    compact_s = time.time() - t0

    n_live = tomb.filter("NOT deleted").count()
    # MEASURE the rebuild set with compact_graph's own selection rule,
    # don't assume it from the planting parity
    n_rebuilt = (
        tomb.groupBy("graph_id")
        .agg(F.avg(F.col("deleted").cast("double")).alias("f"))
        .filter(F.col("f") >= 0.3)
        .count()
    )

    print(json.dumps({
        "n_vectors": n_vec,
        "graphs": g,
        "graphs_rebuilt": n_rebuilt,
        "build_s": round(build_s, 1),
        "compact_s": round(compact_s, 1),
        "live_preserved": bool(n_after == n_live),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
