"""Quickstart: the reference's workflow on this engine, end to end.

Covers the surface a fabstir-vectordb user needs on day one — session
create / add / search (with metadata filters) / train an ANN index /
save + load — plus the two extension axes: bulk DataFrame retrieval
and the training-corpus curation pipeline.

Run:  python examples/quickstart.py
(uses the sf0.001 fixture tables; finishes in ~1 min on local[8])
"""

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def main(spark: SparkSession, workdir: str) -> dict:
    out = {}

    # --- 1. session lifecycle: create -> add -> search -----------------
    from fabstir_vectordb_spark.session import VectorDbSession

    sess = VectorDbSession(spark)  # dimension inferred from the first add
    sess.add_vectors(
        [
            {"id": f"v{i}",
             "vector": [math.cos(i), math.sin(i), i * 0.1, 1.0],
             "metadata": {"category": "even" if i % 2 == 0 else "odd",
                          "rank": i}}
            for i in range(50)
        ]
    )
    hits = sess.search([1.0, 0.0, 0.0, 1.0], k=3)
    out["top_hit"] = hits[0]["id"]

    # metadata filtering uses the reference's Mongo-style dialect and
    # compiles to pushed-down Catalyst predicates
    filtered = sess.search(
        [1.0, 0.0, 0.0, 1.0], k=3,
        filter={"category": "even", "rank": {"$lt": 20}},
    )
    out["filtered_ids"] = [h["id"] for h in filtered]

    # --- 2. ANN: train IVF, probe-pruned search, persist ---------------
    sess.train_index(n_clusters=4)
    out["ann_hit"] = sess.search([1.0, 0.0, 0.0, 1.0], k=1, n_probe=2)[0]["id"]
    path = f"{workdir}/session_save"
    sess.save(path, checksums=True)
    restored = VectorDbSession.load(spark, path)
    out["restored_count"] = restored.get_stats()["vectorCount"]

    # --- 3. bulk retrieval: both sides DataFrames, no driver loops -----
    from fabstir_vectordb_spark.operators.knn import knn_bulk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    bulk = knn_bulk(emb, queries, k=3, metric="cosine",
                    id_col="vec_id", vector_col="embedding")
    out["bulk_rows"] = bulk.count()

    # --- 4. corpus curation: the LLM-pipeline axis ---------------------
    from fabstir_vectordb_spark.pipelines import curate_corpus, pack_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    curated = curate_corpus(
        docs,
        boilerplate_min_doc_freq=None,
        lang="en", min_quality=0.0, max_repetition=0.9,
        token_bounds=(5, 5000),
        near_dup_threshold=0.8,
        source_col="source", max_per_source=10,
    )
    out["curated"] = curated.count()
    out["packed_bins"] = (
        pack_corpus(curated, context_len=256, split="train")
        .select("bin_id").distinct().count()
    )

    # --- 5. RAG: chunk -> embed -> index -> document retrieval ---------
    from fabstir_vectordb_spark.operators.ivf import IVFIndex
    from fabstir_vectordb_spark.pipelines import rag_ingest, rag_search

    ing = rag_ingest(docs, chunk_tokens=32, overlap_tokens=8,
                     embedding_dim=32)
    ridx = IVFIndex.fit(ing, n_clusters=4, seed=7,
                        id_col="chunk_id", vector_col="embedding")
    assigned = ridx.assign(ing)
    rq = ing.limit(3).select(
        F.col("chunk_id").alias("query_id"),
        F.col("embedding").alias("vector"),
    )
    out["rag_docs"] = rag_search(
        ridx, assigned, rq, k_docs=3, k_chunks=8, n_probe=4
    ).count()

    # --- 6. target-directed selection (DSIR) ---------------------------
    from fabstir_vectordb_spark.operators.dsir import (
        dsir_score, dsir_select, fit_dsir_ratios,
    )

    target = docs.filter(F.pmod("doc_id", 10) == 1)  # "looks like this"
    ratios = fit_dsir_ratios(target, docs, n=2, num_buckets=1024)
    picked = dsir_select(
        dsir_score(docs, ratios, n=2, num_buckets=1024),
        k_keep=50, temperature=0.5,
    ).filter("selected")
    out["dsir_selected"] = picked.count()

    # --- 7. compressed tiers: binary Hamming scan + OPQ-rotated PQ -----
    from fabstir_vectordb_spark.operators.binary import BinarySketch
    from fabstir_vectordb_spark.operators.pq import ProductQuantizer

    sk = BinarySketch.fit(dim=64, bits=128)          # 16 bytes/vector
    sigs = sk.encode(emb)
    out["binary_hits"] = sk.hamming_knn(
        sigs, queries, k=3, rerank_vectors=emb, oversample=4
    ).count()
    pq = ProductQuantizer.fit(emb, n_subspaces=8, n_centroids=16,
                              opq=True)              # rotation auto-kept
    out["pq_rotated"] = pq.rotation is not None      # only if it helps
    return out


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    print(main(spark, tempfile.mkdtemp(prefix="quickstart_")))
