"""Hybrid lexical+semantic fusion (operators/fusion.py) vs hand-computed
RRF / weighted-merge models."""

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.fusion import (
    hybrid_retrieval,
    minmax_normalize,
    rrf_fuse,
    weighted_fuse,
    with_rank,
)

# two ranked sources over a 4-doc universe; scores are similarity-like
LEX = [("q", 1, 5.0), ("q", 2, 3.0), ("q", 3, 1.0)]
SEM = [("q", 2, 0.9), ("q", 4, 0.8), ("q", 1, 0.1)]
SCHEMA = "query_id string, id long, score double"


@pytest.fixture(scope="module")
def ranked(spark):
    lex = with_rank(spark.createDataFrame(LEX, SCHEMA))
    sem = with_rank(spark.createDataFrame(SEM, SCHEMA))
    return lex, sem


def test_with_rank_order_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("q", 2, 1.0), ("q", 1, 1.0), ("q", 3, 2.0)], SCHEMA
    )
    got = {r["id"]: r["rank"] for r in with_rank(df).collect()}
    # score desc, then id asc on the tie
    assert got == {3: 1, 1: 2, 2: 3}
    asc = {r["id"]: r["rank"] for r in with_rank(df, ascending=True).collect()}
    assert asc == {1: 1, 2: 2, 3: 3}
    depth = with_rank(df, depth=2).count()
    assert depth == 2


def test_rrf_matches_model(ranked):
    lex, sem = ranked
    got = {r["id"]: r["score"] for r in rrf_fuse(lex, sem, k=10).collect()}
    # lex ranks: 1->1, 2->2, 3->3 ; sem ranks: 2->1, 4->2, 1->3
    model = {
        1: 1 / 61 + 1 / 63,
        2: 1 / 62 + 1 / 61,
        3: 1 / 63,
        4: 1 / 62,
    }
    assert set(got) == set(model)
    for i, s in model.items():
        assert got[i] == pytest.approx(s, abs=1e-12)


def test_rrf_topk_truncates(ranked):
    lex, sem = ranked
    assert rrf_fuse(lex, sem, k=2).count() == 2


def test_minmax_normalize(spark):
    df = spark.createDataFrame(LEX, SCHEMA)
    got = {r["id"]: r["score"] for r in minmax_normalize(df).collect()}
    assert got == {1: 1.0, 2: 0.5, 3: 0.0}
    # constant list -> all 1.0
    const = spark.createDataFrame([("q", 1, 2.0), ("q", 2, 2.0)], SCHEMA)
    got2 = {r["id"]: r["score"] for r in minmax_normalize(const).collect()}
    assert got2 == {1: 1.0, 2: 1.0}


def test_weighted_fuse_matches_model(ranked):
    lex, sem = ranked
    res = weighted_fuse({"lexical": (lex, 0.4), "semantic": (sem, 0.6)}, k=10)
    got = {r["id"]: r["score"] for r in res.collect()}
    # normalized lex: 1->1.0, 2->0.5, 3->0.0 ; sem: 2->1.0, 4->0.875, 1->0.0
    model = {
        1: (0.4 * 1.0 + 0.6 * 0.0) / 1.0,
        2: (0.4 * 0.5 + 0.6 * 1.0) / 1.0,
        3: (0.4 * 0.0) / 0.4,
        4: (0.6 * 0.875) / 0.6,
    }
    assert set(got) == set(model)
    for i, s in model.items():
        assert got[i] == pytest.approx(s, abs=1e-12)


def test_hybrid_retrieval_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark makes big data simple"),
            (1, "vector search with embeddings"),
            (2, "big data pipelines"),
            (3, "unrelated text entirely"),
        ],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.9, 0.1]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    tq = spark.createDataFrame([("q0", "big data")], "query_id string, query string")
    vq = spark.createDataFrame(
        [("q0", [1.0, 0.0])], "query_id string, vector array<float>"
    )
    # lex list: doc2 rank 1 (shorter), doc0 rank 2; sem list: doc0 rank 1,
    # doc2 rank 2 -> RRF ties doc0/doc2 exactly, id tie-break puts doc0 first
    rrf_ids = [
        r["id"]
        for r in hybrid_retrieval(docs, vecs, tq, vq, k=3, depth=4).collect()
    ]
    assert rrf_ids[:2] == [0, 2]
    # weighted: min-max over the 2-item lex list zeroes doc0's lexical
    # contribution while doc2 keeps ~0.997 semantic -> doc2 wins
    w_ids = [
        r["id"]
        for r in hybrid_retrieval(
            docs, vecs, tq, vq, k=3, depth=4, strategy="weighted"
        ).collect()
    ]
    assert w_ids[0] == 2 and set(w_ids[:2]) == {0, 2}
    with pytest.raises(ValueError):
        hybrid_retrieval(docs, vecs, tq, vq, strategy="nope")


def test_hybrid_retrieval_ann_semantic_source(spark, embeddings, documents):
    """The pluggable semantic source: IVF probe search at full probe is
    exact, so the ANN-backed hybrid result must equal the brute-force
    one on the fixture tables (doc ids and vec ids share an id space)."""
    from pyspark.sql import functions as F

    from fabstir_vectordb_spark.operators.fusion import hybrid_retrieval
    from fabstir_vectordb_spark.operators.ivf import IVFIndex

    tq = documents.filter(F.col("doc_id") < 2).select(
        F.concat(F.lit("q"), "doc_id").alias("query_id"),
        F.col("text").alias("query"),
    )
    vq = embeddings.filter(F.col("vec_id") < 2).select(
        F.concat(F.lit("q"), "vec_id").alias("query_id"),
        F.col("embedding").alias("vector"),
    )
    ivf = IVFIndex.fit(embeddings, n_clusters=4, id_col="vec_id", vector_col="embedding")
    clustered = ivf.assign(embeddings) if ivf.is_trained else embeddings

    def ann(queries, depth):
        return ivf.search_bulk(
            clustered, queries, depth,
            n_probe=max(1, ivf.n_clusters), metric="cosine",
        )

    base = hybrid_retrieval(documents, embeddings, tq, vq, k=5, depth=10)
    # brute-force cosine == full-probe IVF cosine, so fusion must agree
    got = hybrid_retrieval(
        documents, embeddings, tq, vq, k=5, depth=10, semantic_search=ann
    )
    b = sorted((r["query_id"], r["id"], round(r["score"], 6)) for r in base.collect())
    g = sorted((r["query_id"], r["id"], round(r["score"], 6)) for r in got.collect())
    assert b == g and len(b) == 10
