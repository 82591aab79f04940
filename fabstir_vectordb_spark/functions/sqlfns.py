"""SQL-surface registration: the vector kernels as SQL scalar functions.

``spark.sql`` users (BI tools, notebooks, the reference's REST-search
audience writing ad-hoc queries) get the same distance semantics as the
DataFrame API without touching Python: each function is a SQL scalar
function (CREATE TEMPORARY FUNCTION ... RETURN <expr>), so it inlines
into Catalyst, participates in whole-stage codegen, and never crosses
into Python — identical performance characteristics to
functions/distance.py, which mirrors the same expressions.

Usage:
    register_sql_functions(spark)
    spark.sql(\"\"\"
      SELECT q.vec_id AS query_id, e.vec_id AS id,
             vec_l2(e.embedding, q.embedding) AS distance
      FROM embeddings e JOIN embeddings q ON q.vec_id < 8
      ORDER BY distance LIMIT 10
    \"\"\")

Reference parity: the same kernel set as SURVEY §2.1
(vector_ops.rs:27-104 dot/l2/cosine/norm/angular, plus the 1/(1+d)
result score, session.rs:225-227).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DOT = (
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(a, CAST(0.0 AS DOUBLE), "
    "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)

_FUNCTIONS: dict[str, str] = {
    "vec_dot": f"""
CREATE OR REPLACE TEMPORARY FUNCTION vec_dot(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
RETURNS DOUBLE RETURN {_DOT}
""",
    "vec_norm": f"""
CREATE OR REPLACE TEMPORARY FUNCTION vec_norm(a ARRAY<FLOAT>)
RETURNS DOUBLE RETURN {_NORM}
""",
    "vec_l2": """
CREATE OR REPLACE TEMPORARY FUNCTION vec_l2(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
RETURNS DOUBLE RETURN sqrt(aggregate(
    zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                           * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
    CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
""",
    # cosine DISTANCE (1 - similarity), zero-vector guarded like
    # distance.py: zero norm => similarity 0 => distance 1
    "vec_cosine_distance": """
CREATE OR REPLACE TEMPORARY FUNCTION vec_cosine_distance(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
RETURNS DOUBLE RETURN 1.0 - CASE
    WHEN vec_norm(a) * vec_norm(b) = 0.0 THEN 0.0
    ELSE vec_dot(a, b) / (vec_norm(a) * vec_norm(b)) END
""",
    "vec_angular_distance": """
CREATE OR REPLACE TEMPORARY FUNCTION vec_angular_distance(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
RETURNS DOUBLE RETURN acos(greatest(-1.0, least(1.0,
    1.0 - vec_cosine_distance(a, b))))
""",
    # the session's result score (session.rs:225-227)
    "similarity_score": """
CREATE OR REPLACE TEMPORARY FUNCTION similarity_score(distance DOUBLE)
RETURNS DOUBLE RETURN 1.0 / (1.0 + distance)
""",
    # --- text-curation kernels (mirror functions/text.py expressions,
    # so the SQL surface and the DataFrame surface cannot diverge) ---
    "text_fingerprint": """
CREATE OR REPLACE TEMPORARY FUNCTION text_fingerprint(t STRING)
RETURNS STRING RETURN md5(trim(regexp_replace(lower(t), '\\\\s+', ' ')))
""",
    "doc_token_count": """
CREATE OR REPLACE TEMPORARY FUNCTION doc_token_count(t STRING)
RETURNS INT RETURN size(split(trim(t), '\\\\s+'))
""",
    "doc_sentence_count": """
CREATE OR REPLACE TEMPORARY FUNCTION doc_sentence_count(t STRING)
RETURNS INT RETURN size(filter(
    split(regexp_replace(t, '([.!?]+)\\\\s+', concat('$1', chr(10))), chr(10)),
    s -> length(trim(s)) > 0))
""",
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every kernel; returns the registered names.  Definition
    order matters: the composite functions reference the base ones."""
    for ddl in _FUNCTIONS.values():
        spark.sql(ddl)
    return list(_FUNCTIONS)
