"""Edge paths of the scale operators: string ids through the cogroup
kernels, degenerate inputs, and guard interaction with short docs."""

from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators import dedup as DD
from fabstir_vectordb_spark.operators.ivfpq import IVFPQIndex
from fabstir_vectordb_spark.operators.knn import knn_bulk


def test_ivfpq_string_ids(spark, embeddings):
    """The cluster-cogroup ADC kernel must handle non-numeric ids (the
    session uses string ids) end-to-end, including the rerank joins."""
    emb = embeddings.filter(F.col("vec_id") < 200).select(
        F.concat(F.lit("v"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    idx = IVFPQIndex.fit(emb, n_clusters=4, n_subspaces=8, n_centroids=16, seed=1)
    enc = idx.encode(emb)
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    res = idx.search_bulk(
        enc, queries, 5, n_probe=4, oversample=2, rerank_vectors=emb
    ).collect()
    assert len(res) == 15
    assert all(r["id"].startswith("v") for r in res)
    # full probe + querying with table members: each query finds itself at
    # distance 0 (exact rerank restores true distances)
    best = {r["query_id"]: r for r in res if r["distance"] == 0.0}
    assert set(best) == {r["query_id"] for r in queries.collect()}


def test_ivfpq_untrained_small_data_bypass(spark, embeddings):
    """Below the IVF training threshold the composite index must degrade
    to plain ADC over the whole (cluster-0) table, mirroring IVFIndex's
    brute-force fallback — not crash in the probe kernel."""
    tiny = embeddings.limit(8)
    idx = IVFPQIndex.fit(tiny, n_clusters=4, n_subspaces=8, n_centroids=8, seed=1)
    assert idx.ivf.centroids is None  # genuinely in untrained mode
    enc = idx.encode(tiny)
    assert enc.select("cluster_id").distinct().collect()[0]["cluster_id"] == 0
    queries = tiny.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    res = idx.search_bulk(enc, queries, 3, n_probe=2, rerank_vectors=tiny).collect()
    assert len(res) == 6
    assert {r["distance"] for r in res if r["query_id"] == r["id"]} == {0.0}


def test_knn_bulk_tiny_inputs(spark, embeddings):
    one_vec = embeddings.limit(1)
    queries = embeddings.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    res = knn_bulk(
        one_vec, queries, 10, metric="l2", id_col="vec_id", vector_col="embedding"
    ).collect()
    # k > table size: one row per (query, vector), never padded
    assert len(res) == 2


def test_guarded_ngram_short_docs(spark):
    """Docs shorter than n tokens are excluded before the guard; a corpus
    of only-short docs yields no pairs rather than an error."""
    docs = spark.createDataFrame(
        [(i, "one two") for i in range(10)], "doc_id long, text string"
    )
    assert DD.ngram_jaccard_pairs(docs, threshold=0.5, n=3).count() == 0
    # and the guard dropping EVERY shingle (cutoff 0 < freq) also yields
    # empty output, not a crash
    docs2 = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(5)],
        "doc_id long, text string",
    )
    assert (
        DD.ngram_jaccard_pairs(docs2, threshold=0.5, n=3, max_shingle_freq=1).count()
        == 0
    )


def test_minhash_all_unique_docs(spark):
    docs = spark.createDataFrame(
        [(i, f"unique text number {i} with words {i * 7} {i * 13}") for i in range(30)],
        "doc_id long, text string",
    )
    assert DD.minhash_lsh_pairs(docs, threshold=0.9).count() == 0
