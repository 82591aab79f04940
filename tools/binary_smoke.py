"""Binary-sketch scale smoke: encode + bulk Hamming scan + exact rerank
at N vectors (the coarse-scan tier next to ivfpq_smoke.py's ADC tier).

Usage: python tools/binary_smoke.py [n_vectors] [n_queries] [bits]
Prints one JSON line with encode seconds and ms/query.
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
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    bits = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("binary_smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.operators.binary import BinarySketch

    out = {"n_vectors": n_vec, "n_queries": n_q, "bits": bits}
    vec = synth_vectors(spark, n_vec).repartition(64).cache()
    vec.count()
    queries = vec.limit(n_q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )

    sk = BinarySketch.fit(dim=64, bits=bits)
    t0 = time.time()
    # persist SIGNATURES ONLY — the scan tier never touches floats
    sigs = vec.select("vec_id", "embedding").transform(
        lambda df: sk.encode(df)
    ).select("vec_id", "sig").cache()
    sigs.count()
    out["encode_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    sk.hamming_knn_bulk(
        sigs, queries, 10, rerank_vectors=vec, oversample=8
    ).write.format("noop").mode("overwrite").save()
    scan = time.time() - t0
    out["scan_rerank_s"] = round(scan, 1)
    out["ms_per_query"] = round(scan * 1000.0 / n_q, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
