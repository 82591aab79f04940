"""Query planning heuristics (SURVEY §4).

The reference hard-codes its optimizations; the two genuinely adaptive
pieces are reproduced here as planner functions:

  auto param tuning     src/hybrid/search_integration.rs:375-449
                        (n_probe / ef / candidate limit by dataset size
                        and k)
  small-data mode       src/hybrid/core.rs:262-269 (< threshold rows =>
                        no index, brute force)

plus the strategy choice this engine adds (brute / IVF / PQ+rerank),
which in Spark terms decides the *physical plan* for the similarity
join.  Everything else in §4 (pruning, lazy IO, caching, predicate
pushdown) is Catalyst/Parquet built-ins — deliberately not re-planned
here.
"""

from __future__ import annotations

from dataclasses import dataclass

# search_integration.rs:385-449 tiers (public repo)
_SMALL = 1_000
_MEDIUM = 100_000
_LARGE = 10_000_000


def tune_n_probe(dataset_size: int, k: int, n_clusters: int) -> int:
    """n_probe by dataset size and k — mirrors the reference's tiering:
    small datasets probe everything (exactness is cheap), large ones
    probe a slice that grows with k."""
    if dataset_size <= _SMALL:
        return n_clusters
    if dataset_size <= _MEDIUM:
        base = max(1, n_clusters // 4)
    elif dataset_size <= _LARGE:
        base = max(1, n_clusters // 8)
    else:
        base = max(1, n_clusters // 16)
    # more results wanted => widen the probe set (rs:427-434 scales ef with k)
    scale = 1 + (k // 50)
    return min(n_clusters, base * scale)


def tune_candidate_limit(k: int) -> int:
    """Oversample factor for post-ranking steps (rerank, threshold)."""
    return max(k * 3, 50)  # k*3 is the reference's oversampling constant


def plan_near_dup(n_rows: int, brute_force_limit: int = 100_000) -> str:
    """Physical strategy for embedding near-dup pairs: the exact kernel
    broadcasts the full (id, vector) matrix to every task, so it is only
    admissible under the limit; above it, cluster-pruned pairs (compare
    within IVF cells only) is the scale path."""
    return "brute" if n_rows <= brute_force_limit else "cluster"


@dataclass
class SearchPlan:
    strategy: str  # "brute" | "ivf" | "pq"
    n_probe: int | None = None
    oversample: int | None = None
    reason: str = ""


def plan_search(
    dataset_size: int,
    k: int,
    n_clusters: int | None,
    has_filter: bool = False,
    filter_selectivity: float | None = None,
    pq_available: bool = False,
    brute_force_threshold: int = 10_000,
) -> SearchPlan:
    """Pick the physical strategy for a similarity join.

    - tiny tables (or no trained index): exact scan — the reference's
      "HNSW-only/small-dataset mode" (hybrid/core.rs:262-269) generalized
    - selective metadata filter: pre-filtered exact scan (the filtered
      subset is small; pruning clusters first would only LOSE recall —
      this supersedes the reference's k*3 oversample post-filter)
    - otherwise IVF probe; PQ+rerank when memory pressure dominates
      (codes are M bytes/vector vs 4*dim).
    """
    if n_clusters is None or dataset_size < brute_force_threshold:
        return SearchPlan("brute", reason="below index threshold / untrained")
    if has_filter and (filter_selectivity or 1.0) <= 0.01:
        return SearchPlan("brute", reason="selective filter => exact scan of subset")
    n_probe = tune_n_probe(dataset_size, k, n_clusters)
    if pq_available and dataset_size > _LARGE:
        return SearchPlan(
            "pq", n_probe=n_probe, oversample=4,
            reason="very large table => compressed codes + exact rerank",
        )
    return SearchPlan("ivf", n_probe=n_probe, reason="clustered probe")
