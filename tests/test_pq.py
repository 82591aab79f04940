"""Product quantizer tests: roundtrip, compression fidelity, ADC search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.knn import brute_force_knn
from fabstir_vectordb_spark.operators.pq import ProductQuantizer


M, KC = 8, 32  # 8 subspaces x 32 centroids on the 64-dim test embeddings


@pytest.fixture(scope="module")
def pq(embeddings):
    return ProductQuantizer.fit(
        embeddings, n_subspaces=M, n_centroids=KC, seed=42, vector_col="embedding"
    )


def test_fit_shapes(pq, embeddings):
    dim = len(embeddings.select("embedding").first()[0])
    assert pq.dim == dim
    assert pq.codebooks.shape == (M, KC, dim // M)


def test_encode_decode_roundtrip(pq, embeddings):
    enc = pq.encode(embeddings)
    rows = pq.decode(enc).select("embedding", "pq_codes", "decoded").collect()
    assert all(len(r["pq_codes"]) == M for r in rows)
    assert all(0 <= c < KC for r in rows for c in r["pq_codes"])
    # reconstruction error must beat quantizing everything to the global mean
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    R = np.asarray([r["decoded"] for r in rows])
    mse = ((X - R) ** 2).mean()
    baseline = ((X - X.mean(axis=0)) ** 2).mean()
    assert mse < baseline * 0.9


def test_encode_is_nearest_centroid(pq, embeddings):
    rows = pq.encode(embeddings.limit(20)).select("embedding", "pq_codes").collect()
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        for m in range(pq.n_subspaces):
            s = v[m * pq.sub_dim : (m + 1) * pq.sub_dim]
            d = ((pq.codebooks[m] - s) ** 2).sum(axis=1)
            assert r["pq_codes"][m] == int(d.argmin())


def test_adc_knn_recall(pq, embeddings, spark):
    queries = embeddings.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    k = 10
    exact = brute_force_knn(
        embeddings, queries, k, metric="l2", id_col="vec_id", vector_col="embedding"
    )
    e = {(r["query_id"], r["id"]) for r in exact.collect()}
    codes = pq.encode(embeddings)
    # raw ADC: coarse 4x16 codes on synthetic (unclustered) data — weak
    approx = pq.adc_knn(codes, queries, k)
    a = {(r["query_id"], r["id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.2
    # ADC + exact re-rank of the 4x over-fetch: the production path
    reranked = pq.adc_knn(
        codes, queries, k, rerank_vectors=embeddings, oversample=4
    )
    rr = {(r["query_id"], r["id"]) for r in reranked.collect()}
    assert len(e & rr) / len(e) >= 0.6
    assert len(e & rr) >= len(e & a)  # re-rank never hurts


def test_adc_knn_bulk_matches_point_path(pq, embeddings):
    """adc_knn_bulk (DataFrame queries, cogrouped kernel) returns exactly
    the rows of driver-collect adc_knn — raw ADC and reranked."""
    queries = embeddings.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    codes = pq.encode(embeddings)
    for kwargs in ({}, {"rerank_vectors": embeddings, "oversample": 4}):
        point = pq.adc_knn(codes, queries, 10, **kwargs)
        bulk = pq.adc_knn_bulk(codes, queries, 10, **kwargs)
        p = sorted(
            (r["query_id"], r["id"], round(r["distance"], 6))
            for r in point.collect()
        )
        b = sorted(
            (r["query_id"], r["id"], round(r["distance"], 6))
            for r in bulk.collect()
        )
        assert p == b


def test_save_load_roundtrip(pq, tmp_path):
    pq.save(str(tmp_path))
    again = ProductQuantizer.load(str(tmp_path))
    assert again.n_subspaces == pq.n_subspaces
    assert np.allclose(again.codebooks, pq.codebooks)
