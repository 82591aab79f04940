"""Query-result cache, session integrity check, k-means training error."""

import pytest

from fabstir_vectordb_spark.operators.cache import QueryResultCache
from fabstir_vectordb_spark.session import VectorDbSession, verify_integrity


def test_cache_fifo_and_stats():
    c = QueryResultCache(max_size=2)
    k1 = QueryResultCache.key([1.0, 2.0], 10)
    k2 = QueryResultCache.key([1.0, 2.0], 20)   # k differs => new key
    k3 = QueryResultCache.key([1.0, 2.5], 10)
    assert k1 != k2 != k3
    assert c.get(k1) is None
    c.put(k1, "a")
    c.put(k2, "b")
    assert c.get(k1) == "a"
    c.put(k3, "c")  # evicts k1 (FIFO, not LRU)
    assert c.get(k1) is None
    st = c.stats()
    assert st["evictions"] == 1 and st["hits"] == 1 and st["misses"] == 2
    c.invalidate()
    assert c.stats()["size"] == 0


def test_session_search_cache_and_invalidation(spark):
    s = VectorDbSession(spark)
    s.add_vectors([{"id": f"v{i}", "vector": [float(i), 0.0]} for i in range(5)])
    r1 = s.search([0.0, 0.0], k=3)
    assert s._cache.stats()["misses"] >= 1
    r2 = s.search([0.0, 0.0], k=3)
    assert s._cache.stats()["hits"] >= 1
    assert r1 == r2
    # a mutation invalidates: the deleted row must disappear
    s.delete_vector("v0")
    r3 = s.search([0.0, 0.0], k=3)
    assert all(x["id"] != "v0" for x in r3)


def test_verify_integrity(spark, tmp_path):
    s = VectorDbSession(spark)
    s.add_vectors([{"id": f"v{i}", "vector": [float(i)]} for i in range(4)])
    s.delete_vector("v1")
    path = str(tmp_path / "sess")
    s.save(path)
    rep = verify_integrity(spark, path)
    assert rep["ok"]
    assert rep["found_live"] == 3 and rep["found_deleted"] == 1

    # corrupt the manifest -> not ok
    import json, os
    with open(os.path.join(path, "manifest.json")) as f:
        m = json.load(f)
    m["total_vectors"] = 99
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(m, f)
    assert not verify_integrity(spark, path)["ok"]


def test_ivf_training_error(embeddings):
    from fabstir_vectordb_spark.operators.ivf import IVFIndex

    i2 = IVFIndex.fit(embeddings, n_clusters=2, seed=42,
                      id_col="vec_id", vector_col="embedding")
    i32 = IVFIndex.fit(embeddings, n_clusters=32, seed=42,
                       id_col="vec_id", vector_col="embedding")
    assert i2.training_error is not None and i32.training_error is not None
    # more clusters => lower mean squared distance (ivf/core.rs:419-429)
    assert i32.training_error < i2.training_error
