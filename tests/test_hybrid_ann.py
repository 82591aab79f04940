"""Hybrid HNSW-recent + IVF-historical fan-out
(src/hybrid/core.rs:425-486)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.hnsw import HNSWIndex
from fabstir_vectordb_spark.operators.hybrid import hybrid_ann_search
from fabstir_vectordb_spark.operators.ivf import IVFIndex
from fabstir_vectordb_spark.operators.knn import brute_force_knn

K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    rows = [(int(i), rng.normal(size=12).tolist()) for i in range(500)]
    return spark.createDataFrame(rows, "id long, vector array<double>").cache()


def test_hybrid_exact_configs_equal_exact_knn(spark, corpus):
    # recent = last 100 ids, historical = the rest; both sides exact
    recent = corpus.filter(F.col("id") >= 400)
    hist = corpus.filter(F.col("id") < 400)
    queries = corpus.filter(F.col("id") % 50 == 0).select(
        F.col("id").alias("query_id"), "vector"
    )
    hnsw = HNSWIndex(M=512, M0=512, ef_construction=512, num_graphs=2,
                     id_col="id", vector_col="vector")
    graph = hnsw.build(recent).cache()
    ivf = IVFIndex.fit(hist, n_clusters=8, seed=1, id_col="id", vector_col="vector")
    clustered = ivf.assign(hist).cache()

    res = (
        hybrid_ann_search(
            graph, hnsw, clustered, ivf, queries, K,
            ef=512, n_probe=8,  # full probe: 8 == n_clusters
        )
        .orderBy("query_id", F.round("distance", 6), "id")
        .collect()
    )
    exact = (
        brute_force_knn(corpus, queries, K, metric="l2",
                        id_col="id", vector_col="vector")
        .orderBy("query_id", F.round("distance", 6), "id")
        .collect()
    )
    assert [(r["query_id"], r["id"]) for r in res] == [
        (r["query_id"], r["id"]) for r in exact
    ]
    for a, b in zip(res, exact):
        assert a["distance"] == pytest.approx(b["distance"], abs=1e-9)


def test_hybrid_dedups_mid_migration_overlap(spark, corpus):
    # rows 350-449 present on BOTH sides (migration in flight): results
    # must contain each id at most once, at its true distance
    recent = corpus.filter(F.col("id") >= 350)
    hist = corpus.filter(F.col("id") < 450)
    queries = corpus.filter(F.col("id") == 400).select(
        F.col("id").alias("query_id"), "vector"
    )
    hnsw = HNSWIndex(M=512, M0=512, ef_construction=512, num_graphs=2,
                     id_col="id", vector_col="vector")
    ivf = IVFIndex.fit(hist, n_clusters=8, seed=1, id_col="id", vector_col="vector")
    res = hybrid_ann_search(
        hnsw.build(recent), hnsw, ivf.assign(hist), ivf, queries, K,
        ef=512, n_probe=8,
    ).collect()
    ids = [r["id"] for r in res]
    assert len(ids) == len(set(ids)) == K
    # the query vector itself is in the overlap: rank 1 at distance 0
    best = min(res, key=lambda r: r["distance"])
    assert best["id"] == 400 and best["distance"] == pytest.approx(0.0)
