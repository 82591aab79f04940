"""OPQ recall study: IVFPQ recall@10 with and without the OPQ rotation
(operators/opq.py) on two 64-dim synthetic geometries at N vectors:

- uniform: the adversarial distance-concentrated fixture of the round-5
  knob-recovery study (iid hash dims — NO correlation to exploit, so the
  honest expectation is "rotation falls back or ties");
- correlated: a 16-latent-factor mix (x = z @ A + noise), the geometry
  real embedding matrices have and the case OPQ exists for.

Protocol mirrors the knob-recovery study: exact brute-force ground
truth over Q queries, IVFPQ residual search with probe/oversample +
exact rerank, recall@10 = mean per-query overlap with the truth set.

Usage: python tools/opq_smoke.py [n_vectors] [n_queries]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_uniform(spark, n: int, dim: int = 64):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.xxhash64(F.col("id"), i) % 1000).cast("float") / 1000.0,
        ).alias("embedding"),
    )


def synth_correlated(spark, n: int, dim: int = 64, latent: int = 16, seed: int = 7):
    """x = z @ A + 0.05*noise, all deterministic from the row id: z and
    noise are hash-derived, A is a fixed literal mixing matrix — so the
    fixture is reproducible across runs and engines."""
    rng = np.random.RandomState(seed)
    A = rng.normal(size=(latent, dim))
    # literal A^T as array<array<double>> (dim rows of latent weights)
    a_lit = F.array(
        *[
            F.array(*[F.lit(float(A[l, j])) for l in range(latent)])
            for j in range(dim)
        ]
    )
    z = F.transform(
        F.sequence(F.lit(0), F.lit(latent - 1)),
        lambda l: (F.xxhash64(F.col("id"), l) % 2000).cast("double") / 1000.0 - 1.0,
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            a_lit,
            lambda row, j: F.aggregate(
                F.zip_with(z, row, lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v
            )
            + (F.xxhash64(F.col("id"), j + 1000) % 100).cast("double") / 1000.0,
        ).alias("embedding"),
    )


def recall_at_k(res, truth, k: int = 10) -> float:
    hit = res.join(truth, ["query_id", "id"]).groupBy("query_id").count()
    total = truth.select("query_id").distinct().count()
    got = hit.agg(F.sum("count")).first()[0] or 0
    return float(got) / (total * k)


def main() -> int:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("opq_smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.operators.ivfpq import IVFPQIndex
    from fabstir_vectordb_spark.operators.knn import knn_bulk

    out = {"n_vectors": n_vec, "n_queries": n_q}
    for name, synth in (("uniform", synth_uniform), ("correlated", synth_correlated)):
        vec = synth(spark, n_vec).repartition(64).cache()
        vec.count()
        queries = vec.limit(n_q).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
        )
        truth = (
            knn_bulk(vec, queries, 10, metric="l2",
                     id_col="vec_id", vector_col="embedding")
            .select("query_id", "id")
            .cache()
        )
        truth.count()
        for tag, geom, opq in (
            ("m8_raw", dict(n_subspaces=8, n_centroids=32), False),
            ("m8_opq", dict(n_subspaces=8, n_centroids=32), True),
            ("m16_raw", dict(n_subspaces=16, n_centroids=128), False),
            ("m16_opq", dict(n_subspaces=16, n_centroids=128), True),
        ):
            t0 = time.time()
            idx = IVFPQIndex.fit(
                vec, n_clusters=64, residual=True, opq=opq, **geom
            )
            fit_s = time.time() - t0
            enc = idx.encode(vec).cache()
            enc.count()
            res = idx.search_bulk(
                enc, queries, 10, n_probe=16, oversample=8, rerank_vectors=vec
            )
            r = recall_at_k(res, truth)
            enc.unpersist()
            out[f"{name}_{tag}"] = {
                "recall@10": round(r, 3),
                "fit_s": round(fit_s, 1),
                "rotated": bool(idx.pq.rotation is not None),
            }
            print(f"# {name} {tag}: recall={r:.3f} fit={fit_s:.1f}s "
                  f"rotated={idx.pq.rotation is not None}", file=sys.stderr)
        truth.unpersist()
        vec.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
