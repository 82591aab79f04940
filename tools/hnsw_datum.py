"""Focused HNSW amortized-datum measurement (bench.py's hnsw block alone):
100k vectors (sf0.1 x 50 replicas), num_graphs = cpus, 200 queries, k=10,
ef=64 — median-of-5 ms/query plus the one-time build seconds.

Usage: python tools/hnsw_datum.py   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from fabstir_vectordb_spark.operators.hnsw import HNSWIndex  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hnsw_datum")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:+AlwaysPreTouch",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    def timed(fn) -> float:
        samples = []
        for _ in range(REPS):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        samples.sort()
        return samples[len(samples) // 2] if REPS % 2 else (
            samples[REPS // 2 - 1] + samples[REPS // 2]
        ) / 2

    REPLICAS = 50
    work = tempfile.mkdtemp(prefix="hnsw_datum_")
    try:
        emb = E._t(spark, sf_dir, "embeddings")
        reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("__rep"))
        big = emb.crossJoin(reps).select(
            (F.col("vec_id") * REPLICAS + F.col("__rep")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.col("__rep") * F.lit(0.0007)
            ).alias("embedding"),
        )
        big.write.mode("overwrite").parquet(f"{work}/vectors")
        corpus = spark.read.parquet(f"{work}/vectors")
        n_vectors = corpus.count()
        hnsw = HNSWIndex(
            M=16, M0=32, ef_construction=100, num_graphs=int(cpus),
            id_col="vec_id", vector_col="embedding",
        )
        t0 = time.time()
        g = hnsw.build(corpus).cache()
        g.count()
        build_s = time.time() - t0
        queries = corpus.filter(
            F.col("vec_id") % (n_vectors // 1000) == 0
        ).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
        )
        hq = queries.limit(200)

        def hnsw_search():
            hnsw.search_bulk(g, hq, 10, ef=64).write.format("noop").mode(
                "overwrite"
            ).save()

        hnsw_search()  # warm
        ms = timed(hnsw_search) * 1000.0 / 200
        print(
            f'{{"hnsw_build_s": {build_s:.2f}, "hnsw_ms_per_query": {ms:.3f}, '
            f'"vectors": {n_vectors}, "cpus": {cpus}}}'
        )
        g.unpersist()
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
