"""Focused IVFPQ scale smoke: fit + encode + bulk probe-pruned ADC
search with exact rerank at N vectors (the archive-tier 100 TB layout),
extending round 5's 2M-vector series.

Usage: python tools/ivfpq_smoke.py [n_vectors] [n_queries] [n_clusters] [n_probe]
Prints one JSON line with fit/encode/probe seconds and ms/query.
Scale n_clusters with the corpus (~sqrt(N) is the standard rule): at a
fixed cluster count, vectors-per-cluster — and therefore every probed
Arrow frame and the bytes a fixed-probe search reads — grows linearly
with N.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_vectors(spark, n: int, dim: int = 64):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.xxhash64(F.col("id"), i) % 1000).cast("float") / 1000.0,
        ).alias("embedding"),
    )


def main() -> int:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    n_cl = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_pr = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ivfpq_smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.operators.ivfpq import IVFPQIndex

    out = {"n_vectors": n_vec, "n_queries": n_q, "n_clusters": n_cl, "n_probe": n_pr}
    vec = synth_vectors(spark, n_vec).repartition(64).cache()
    vec.count()
    queries = vec.limit(n_q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )

    t0 = time.time()
    idx = IVFPQIndex.fit(
        vec, n_clusters=n_cl, n_subspaces=16, n_centroids=128, residual=True
    )
    out["fit_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    enc = idx.encode(vec).cache()
    enc.count()
    out["encode_s"] = round(time.time() - t0, 1)
    vec.unpersist()  # probe path reads codes; rerank pulls raw rows lazily

    rerank = synth_vectors(spark, n_vec)
    t0 = time.time()
    idx.search_bulk(
        enc, queries, 10, n_probe=n_pr, oversample=8, rerank_vectors=rerank
    ).write.format("noop").mode("overwrite").save()
    probe = time.time() - t0
    out["probe_bulk_s"] = round(probe, 1)
    out["ms_per_query"] = round(probe * 1000.0 / n_q, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
