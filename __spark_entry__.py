"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()[name](spark, sf_dir)`` are the implemented operators from
SURVEY.md §2 (plus the LLM-pipeline extensions); ``oracle_sql()[name]``
is the DuckDB-equivalent SQL the driver compares against at sf0.01.

Determinism across engines: every ranking orders by
(round(value, 6), id) and every emitted float is round()ed, so a ~1e-13
summation-order difference between Spark and DuckDB can never change a
hash.  Money-style aggregates over many rows use DECIMAL sums (exact,
order-independent).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fabstir_vectordb_spark.operators.knn import brute_force_knn  # noqa: E402
from fabstir_vectordb_spark.functions import distance as D  # noqa: E402

K = 10
NQ = 8  # query vectors = embeddings with vec_id < NQ


def r6(c) -> F.Column:
    """round to 6 decimals and canonicalize -0.0 -> 0.0 (cross-engine hash)."""
    if isinstance(c, str):
        c = F.col(c)
    return F.round(c, 6) + F.lit(0.0)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _query_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < NQ)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector"))
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-query L2 top-k (SURVEY §2.4 brute-force k-NN scan)."""
    emb = _t(spark, sf_dir, "embeddings")
    res = brute_force_knn(
        emb, _query_vectors(spark, sf_dir), K,
        metric="l2", impl="kernel", id_col="vec_id", vector_col="embedding",
    )
    return res.select(
        "query_id", "id", r6("distance").alias("distance")
    )


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-distance top-k (WASM index metric, SURVEY §1.4)."""
    emb = _t(spark, sf_dir, "embeddings")
    res = brute_force_knn(
        emb, _query_vectors(spark, sf_dir), K,
        metric="cosine", impl="kernel", id_col="vec_id", vector_col="embedding",
    )
    return res.select(
        "query_id", "id", r6("distance").alias("distance")
    )


def q_knn_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-inner-product top-k (SURVEY §2.1 dot kernel as ranking)."""
    emb = _t(spark, sf_dir, "embeddings")
    res = brute_force_knn(
        emb, _query_vectors(spark, sf_dir), K,
        metric="dot", impl="kernel", id_col="vec_id", vector_col="embedding",
    )
    return res.select(
        "query_id", "id", r6(-F.col("distance")).alias("dot")
    )


def q_dist_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All scalar distance kernels on a 5x5 pair grid (SURVEY §2.1)."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .select(
            "a_id",
            "b_id",
            r6(D.dot("va", "vb")).alias("dot"),
            r6(D.l2_distance("va", "vb")).alias("l2"),
            r6(D.cosine_similarity("va", "vb")).alias("cos"),
            r6(D.angular_distance("va", "vb")).alias("angular"),
        )
    )


def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magnitude + normalize roundtrip (SURVEY §2.1)."""
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        r6(D.norm("embedding")).alias("norm"),
        r6(D.norm(D.normalize("embedding"))).alias("unit_norm"),
    )


def q_search_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """score = 1/(1+d) with threshold filter (session.rs:287-293)."""
    emb = _t(spark, sf_dir, "embeddings")
    res = brute_force_knn(
        emb, _query_vectors(spark, sf_dir), 50,
        metric="l2", impl="kernel", id_col="vec_id", vector_col="embedding",
    )
    scored = res.select(
        "query_id",
        "id",
        # score from the ROUNDED distance — the rounded value is the
        # cross-engine contract, so derived values must start from it too
        r6(D.similarity_score(F.round("distance", 6))).alias("score"),
    )
    return scored.filter(F.col("score") >= 0.1)


# --------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, same parquet tables as views)
# --------------------------------------------------------------------------

_L2 = (
    "(round(sqrt(list_sum(list_transform(list_zip(e.embedding, q.qv), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
    "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))), 6) + 0.0)"
)
_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_NORM = (
    "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def _oracle_knn(select: str, order: str, k: int = K) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {NQ}
), d AS (
  SELECT q.query_id, e.vec_id AS id,
         {select}
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY {order}, id) AS rn
  FROM d
)
SELECT * EXCLUDE (rn) FROM r WHERE rn <= {k}
"""


_ORACLES: dict[str, str] = {
    "knn_l2": _oracle_knn(f"{_L2} AS distance", "distance"),
    "knn_cosine": _oracle_knn(
        "(round(1.0 - (CASE WHEN {na} * {nq} = 0 THEN 0.0 ELSE {dot} / ({na} * {nq}) END), 6) + 0.0) AS distance".format(
            na=_NORM.format(a="e.embedding"),
            nq=_NORM.format(a="q.qv"),
            dot=_DOT.format(a="e.embedding", b="q.qv"),
        ),
        "distance",
    ),
    "knn_dot": _oracle_knn(
        "(round({dot}, 6) + 0.0) AS dot".format(dot=_DOT.format(a="e.embedding", b="q.qv")),
        "dot DESC",
    ),
    "dist_kernels": """
WITH p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.embedding AS va, b.embedding AS vb
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id < 5 AND b.vec_id < 5
)
SELECT a_id, b_id,
  (round({dot}, 6) + 0.0) AS dot,
  (round(sqrt(list_sum(list_transform(list_zip(va, vb),
        q -> (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))
           * (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))))), 6) + 0.0) AS l2,
  (round(CASE WHEN {na} * {nb} = 0 THEN 0.0 ELSE {dot} / ({na} * {nb}) END, 6) + 0.0) AS cos,
  (round(acos(greatest(-1.0, least(1.0,
        CASE WHEN {na} * {nb} = 0 THEN 0.0 ELSE {dot} / ({na} * {nb}) END))), 6) + 0.0) AS angular
FROM p
""".format(
        dot=_DOT.format(a="va", b="vb"),
        na=_NORM.format(a="va"),
        nb=_NORM.format(a="vb"),
    ),
    "vector_norms": """
SELECT vec_id,
  (round({n}, 6) + 0.0) AS norm,
  (round(CASE WHEN {n} = 0 THEN 0.0 ELSE 1.0 END, 6) + 0.0) AS unit_norm
FROM embeddings
""".format(n=_NORM.format(a="embedding")),
    "search_threshold": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {nq}
), d AS (
  SELECT q.query_id, e.vec_id AS id, {l2} AS distance
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, id, distance,
         row_number() OVER (PARTITION BY query_id ORDER BY distance, id) AS rn
  FROM d
)
SELECT query_id, id, (round(1.0 / (1.0 + distance), 6) + 0.0) AS score
FROM r WHERE rn <= 50 AND round(1.0 / (1.0 + distance), 6) >= 0.1
""".format(nq=NQ, l2=_L2),
}


# --------------------------------------------------------------------------
# driver entry points
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact multi-query vector search at sf0.001."""
    return q_knn_l2(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "knn_l2": q_knn_l2,
        "knn_cosine": q_knn_cosine,
        "knn_dot": q_knn_dot,
        "dist_kernels": q_dist_kernels,
        "vector_norms": q_vector_norms,
        "search_threshold": q_search_threshold,
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
