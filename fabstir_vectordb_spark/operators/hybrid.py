"""Hybrid recent+historical ANN — the reference's core architecture
composed from its Spark-native halves.

Parity target: src/hybrid/core.rs — HNSW serves the recent window, IVF
the historical archive; a search fans out to both and merges
(core.rs:425-486; parallel fan-out search_integration.rs:125-211).  In
this engine the same table CAN serve both sides through the ts
predicate (SURVEY §2 row 37), but at scale the two-layout split is the
right physical design, exactly as the reference argues:

  - recent delta: small, hot, mutation-heavy → partition-local HNSW
    graphs (operators/hnsw.py) — low-latency beam search, cheap full
    rebuild on the delta
  - historical archive: huge, append-mostly → IVF-clustered (or IVFPQ-
    encoded) parquet partitioned by cluster_id — probe-pruned scans

``hybrid_ann_search`` runs both sides as DataFrame plans and merges
with min-distance dedup (SearchResult::dedup, types.rs:206-223) — both
fan-out legs are lazy Spark jobs, so the "parallel search with timeout"
machinery of the reference collapses into one action.  Exactness: when
both sides are configured exact (complete-graph HNSW, full-probe IVF)
the merged result IS exact kNN over the union corpus — the test oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fabstir_vectordb_spark.operators.hnsw import HNSWIndex
from fabstir_vectordb_spark.operators.ivf import IVFIndex
from fabstir_vectordb_spark.operators.topk import merge_dedup, topk_per_query


def hybrid_ann_search(
    recent_graph: DataFrame,
    hnsw: HNSWIndex,
    historical_clustered: DataFrame,
    ivf: IVFIndex,
    queries: DataFrame,
    k: int,
    ef: int = 64,
    n_probe: int = 8,
    query_id_col: str = "query_id",
    query_vector_col: str = "vector",
) -> DataFrame:
    """Fan out one query set to the HNSW recent delta and the IVF
    historical archive; merge min-distance, exact global top-k.
    Output: (query_id, id, distance) ascending, k rows per query.

    A vector present on both sides (mid-migration) dedups to its best
    distance — the reference's dedup-on-merge semantics, so migration
    lag never yields duplicate hits.

    The metric is shared: the IVF leg runs with the HNSW index's metric
    (l2 or cosine), so both legs emit distances on the SAME scale and
    the min-distance merge compares like with like — an L2 leg merged
    with a 1-cos leg would silently produce a wrong global top-k."""
    rec = hnsw.search_bulk(
        recent_graph, queries, k, ef=ef,
        query_id_col=query_id_col, query_vector_col=query_vector_col,
    )
    hist = ivf.search_bulk(
        historical_clustered, queries, k, n_probe=n_probe, metric=hnsw.metric,
        query_id_col=query_id_col, query_vector_col=query_vector_col,
    )
    merged = merge_dedup(rec, hist, query_col=query_id_col)
    return topk_per_query(merged, k, query_col=query_id_col)
