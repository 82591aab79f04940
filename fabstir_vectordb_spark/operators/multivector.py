"""Multi-vector (late-interaction) retrieval: ColBERT-style MaxSim.

One embedding per document compresses away word-level signal; the
late-interaction family (ColBERT, Khattab & Zaharia 2020) keeps ONE
VECTOR PER TOKEN and scores a (query, document) pair as

    score(q, d) = sum over query tokens t of
                  max over document tokens u of  <t, u>

— each query token finds its best-matching document token, and the
per-token winners add up.  ``maxsim_topk`` computes the EXACT top-k
documents per query under that rule over token tables
``(id, token_idx, vector)``.

Spark plan — document token vectors NEVER shuffle:

  1. The query token table broadcasts (queries are a bounded batch;
     Q_tokens rows).  Each document-token row computes its dot
     against every query token map-side (``zip_with`` +
     ``aggregate`` — JVM column expressions, no UDF).
  2. ``groupBy (query, doc, query_token) max`` — the inner MAX.
     Partial aggregation collapses the Q_tokens-fold expansion
     map-side, so the ONLY shuffle carries one compact row per
     (query, doc, query-token) candidate triple.
  3. ``groupBy (query, doc) sum`` — the outer SUM (reuses the same
     partitioning prefix), then a per-query top-k window over
     (rounded score DESC, doc ASC) — the repo's deterministic
     ranking rule, so engines agree on boundary rows.

Exactness and the scale path, stated honestly: step 1 is a full
cross of document tokens x query tokens — the exact formulation,
right when either side is bounded (a query batch against a corpus:
cost is one corpus pass x Q_tokens multiply-adds per row, the same
shape as the brute-force kNN kernel).  At billions of documents,
generate CANDIDATES first (token-level ANN with operators/knn.py or
ivf.py over the token table — ColBERT's own two-stage recipe) and
pass them as ``candidates``: scoring then joins doc tokens to only
their candidate queries instead of crossing, and the result is exact
over exactly that candidate set (rescoring reads EVERY token of a
candidate document, so scores equal the full operator's for every
pair scored — only the candidate screen is approximate).

Reference parity: none (the reference is single-vector);
extension-axis with operators/knn.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["maxsim_topk"]


def maxsim_topk(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    query_col: str = "query_id",
    token_col: str = "token_idx",
    vec_col: str = "vector",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact MaxSim top-k documents per query (module docstring).

    ``doc_tokens``    (id_col, token_col, vec_col) — one row per
                      document token.
    ``query_tokens``  (query_col, token_col, vec_col) — one row per
                      query token; broadcast, so keep the query batch
                      bounded (the kNN-kernel contract).
    ``candidates``    optional (query_col, id_col) pair frame: score
                      only these pairs (the two-stage path — see the
                      module docstring).  Scores for scored pairs are
                      identical to the full cross.

    Output: (query_col, id_col, ``score`` double, ``rank`` 1..k),
    ranked by (round(score, 6) DESC, id ASC) — rounding before
    ranking keeps the cut deterministic across summation orders.
    Rows whose vectors are NULL are dropped up front; documents with
    no tokens simply never score.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    if query_col == id_col:
        raise ValueError("query_col and id_col must differ")

    d = doc_tokens.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col).alias("__dv")
    )
    q = query_tokens.filter(F.col(vec_col).isNotNull()).select(
        F.col(query_col),
        F.col(token_col).alias("__qt"),
        F.col(vec_col).alias("__qv"),
    )
    if candidates is not None:
        # two-stage: attach each doc token to ITS candidate queries,
        # then score only those (query, doc) pairs — every token of a
        # candidate doc participates, so pair scores equal the full
        # operator's
        cand = candidates.select(query_col, id_col).distinct()
        paired = d.join(F.broadcast(cand), id_col).join(
            F.broadcast(q), query_col
        )
    else:
        paired = d.crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("__dv", "__qv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # inner MAX collapses map-side (partial agg): the shuffle carries
    # one row per (query, doc, query-token), never per token pair
    inner = paired.groupBy(query_col, id_col, "__qt").agg(
        F.max(dot).alias("__m")
    )
    scored = inner.groupBy(query_col, id_col).agg(
        F.sum("__m").alias("score")
    )
    rank = F.row_number().over(
        Window.partitionBy(query_col).orderBy(
            F.round(F.col("score"), 6).desc(), F.col(id_col).asc()
        )
    )
    return scored.withColumn("rank", rank).filter(F.col("rank") <= k)
