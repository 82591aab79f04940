"""MaxSim late-interaction retrieval: the broadcast + two-level
aggregate plan must reproduce a numpy reference of the ColBERT rule
(sum over query tokens of the max dot against the document's tokens)
for ANY random token tables, and the candidate-restricted path must
score pairs identically to the full cross."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.multivector import maxsim_topk

DIM = 8


def _tables(spark, n_docs=12, n_queries=3, seed=7):
    rng = np.random.default_rng(seed)
    doc_rows, q_rows = [], []
    docs = {}
    for d in range(n_docs):
        toks = rng.standard_normal((rng.integers(1, 5), DIM)).round(3)
        docs[d] = toks
        doc_rows += [(d, i, [float(x) for x in t])
                     for i, t in enumerate(toks)]
    queries = {}
    for qid in range(n_queries):
        toks = rng.standard_normal((rng.integers(1, 4), DIM)).round(3)
        queries[qid] = toks
        q_rows += [(qid, i, [float(x) for x in t])
                   for i, t in enumerate(toks)]
    dt = spark.createDataFrame(
        doc_rows, "doc_id long, token_idx int, vector array<double>"
    )
    qt = spark.createDataFrame(
        q_rows, "query_id long, token_idx int, vector array<double>"
    )
    return dt, qt, docs, queries


def _reference_topk(docs, queries, k):
    out = {}
    for qid, qtoks in queries.items():
        scores = []
        for d, dtoks in docs.items():
            s = float(sum((qt @ dtoks.T).max() for qt in qtoks))
            scores.append((d, s))
        scores.sort(key=lambda t: (-round(t[1], 6), t[0]))
        out[qid] = scores[:k]
    return out


def test_maxsim_matches_numpy_reference(spark):
    dt, qt, docs, queries = _tables(spark)
    got = {}
    for r in maxsim_topk(dt, qt, k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    want = _reference_topk(docs, queries, 5)
    for qid, rows in got.items():
        rows.sort()
        assert [d for _, d, _ in rows] == [d for d, _ in want[qid]]
        for (_, _, s), (_, ws) in zip(rows, want[qid]):
            assert s == pytest.approx(ws, rel=1e-9)


def test_maxsim_candidates_path_scores_identically(spark):
    dt, qt, docs, queries = _tables(spark, n_docs=10)
    full = {(r["query_id"], r["doc_id"]): r["score"]
            for r in maxsim_topk(dt, qt, k=10).collect()}
    # candidates = every pair -> same top-k, identical scores
    cand = spark.createDataFrame(
        [(q, d) for q in queries for d in docs],
        "query_id long, doc_id long",
    )
    two = {(r["query_id"], r["doc_id"]): r["score"]
           for r in maxsim_topk(dt, qt, k=10, candidates=cand).collect()}
    assert two == full
    # a RESTRICTED candidate set scores its pairs exactly as the full
    half = cand.filter(F.col("doc_id") % 2 == 0)
    restr = {(r["query_id"], r["doc_id"]): r["score"]
             for r in maxsim_topk(dt, qt, k=10, candidates=half).collect()}
    assert restr == {p: s for p, s in full.items() if p[1] % 2 == 0}


def test_maxsim_null_vectors_and_validation(spark):
    dt = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (1, 1, None), (2, 0, [0.0, 1.0])],
        "doc_id long, token_idx int, vector array<double>",
    )
    qt = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])], "query_id long, token_idx int, vector array<double>"
    )
    rows = {r["doc_id"]: r["score"]
            for r in maxsim_topk(dt, qt, k=5).collect()}
    assert rows == {1: 1.0, 2: 0.0}
    with pytest.raises(ValueError, match="k must be"):
        maxsim_topk(dt, qt, k=0)
    with pytest.raises(ValueError, match="must differ"):
        maxsim_topk(dt, qt, id_col="x", query_col="x")


def test_maxsim_plan_broadcasts_queries_no_udf(spark):
    dt, qt, _, _ = _tables(spark, n_docs=4, n_queries=2)
    plan = maxsim_topk(dt, qt, k=3)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_maxsim_kernel_equals_expr(spark):
    """impl='kernel' (Arrow GEMM + partition-local maxes) returns the
    same ranking and per-pair scores as the certified expression path,
    with and without a candidate restriction."""
    dt, qt, _, _ = _tables(spark, n_docs=14, n_queries=3, seed=11)
    # spread doc tokens across partitions so the cross-partition max
    # merge actually exercises
    dt = dt.repartition(6)
    for cand in (None,
                 spark.createDataFrame(
                     [(q, d) for q in range(3) for d in range(0, 14, 2)],
                     "query_id long, doc_id long")):
        e = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
             for r in maxsim_topk(dt, qt, k=6, candidates=cand).collect()}
        g = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
             for r in maxsim_topk(dt, qt, k=6, candidates=cand,
                                  impl="kernel").collect()}
        assert set(e) == set(g)
        for p in e:
            assert e[p][0] == g[p][0]
            assert g[p][1] == pytest.approx(e[p][1], rel=1e-9)
    with pytest.raises(ValueError, match="impl"):
        maxsim_topk(dt, qt, impl="nope")


def test_maxsim_kernel_string_ids_and_empty_queries(spark):
    """The kernel carries non-integral id dtypes through (string doc
    and query ids), and an empty query-token table yields an empty,
    correctly-typed frame in both impls."""
    dt = spark.createDataFrame(
        [("docA", 0, [1.0, 0.0]), ("docA", 1, [0.0, 2.0]),
         ("docB", 0, [0.5, 0.5])],
        "doc_id string, token_idx int, vector array<double>",
    )
    qt = spark.createDataFrame(
        [("q1", 0, [1.0, 0.0]), ("q1", 1, [0.0, 1.0])],
        "query_id string, token_idx int, vector array<double>",
    )
    for impl in ("expr", "kernel"):
        got = {(r["query_id"], r["doc_id"]): r["score"]
               for r in maxsim_topk(dt, qt, k=5, impl=impl).collect()}
        assert got == {("q1", "docA"): 3.0, ("q1", "docB"): 1.0}, impl
    empty_q = qt.limit(0)
    for impl in ("expr", "kernel"):
        out = maxsim_topk(dt, empty_q, k=5, impl=impl)
        assert out.count() == 0
        assert dict(out.dtypes)["doc_id"] == "string", impl
        assert dict(out.dtypes)["query_id"] == "string", impl


def test_maxsim_kernel_handles_duplicate_query_tokens(spark):
    """Duplicate (query_id, token_idx) rows in query_tokens: the expr
    path collapses them via groupBy(query, doc, token) max; the kernel
    path must merge its duplicate GEMM slots BY MAX, not sum them
    (r9 advice) — parity pinned with DIFFERING duplicate vectors."""
    dt, qt, docs, queries = _tables(spark, n_docs=8, n_queries=2)
    rng = np.random.default_rng(11)
    dup = spark.createDataFrame(
        [
            (qid, 0, [float(x) for x in rng.standard_normal(DIM).round(3)])
            for qid in queries
        ],
        "query_id long, token_idx int, vector array<double>",
    )
    qt_dup = qt.unionByName(dup)
    expr = {(r["query_id"], r["doc_id"]): r["score"]
            for r in maxsim_topk(dt, qt_dup, k=8, impl="expr").collect()}
    kern = {(r["query_id"], r["doc_id"]): r["score"]
            for r in maxsim_topk(dt, qt_dup, k=8, impl="kernel").collect()}
    assert set(expr) == set(kern)
    for pair, s in expr.items():
        assert kern[pair] == pytest.approx(s, rel=1e-9)


def test_two_stage_full_probe_equals_exact(spark):
    """maxsim_search at its exhaustive hook (n_probe >= n_clusters,
    token_k >= all doc tokens, n_candidates >= all docs) must equal
    single-stage maxsim_topk INCLUDING ranks — the screen is provably
    complete there, and the rescore is exact by the candidates
    contract."""
    from fabstir_vectordb_spark.operators.multivector import maxsim_search

    dt, qt, docs, queries = _tables(spark, n_docs=30, n_queries=3)
    n_tokens = sum(len(t) for t in docs.values())
    exact = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in maxsim_topk(dt, qt, k=5).collect()
    )
    two = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in maxsim_search(
            dt, qt, k=5, n_candidates=len(docs),
            token_k=n_tokens, n_probe=10_000, n_clusters=4,
        ).collect()
    )
    assert two == exact


def test_candidates_shape_and_validation(spark):
    """maxsim_candidates emits distinct (query, doc) pairs bounded by
    n_candidates per query; maxsim_search refuses n_candidates < k."""
    from fabstir_vectordb_spark.operators.multivector import (
        maxsim_candidates, maxsim_search,
    )

    dt, qt, docs, queries = _tables(spark, n_docs=25, n_queries=3)
    cand = maxsim_candidates(
        dt, qt, n_candidates=7, token_k=8, n_probe=2, n_clusters=4,
    )
    rows = cand.collect()
    assert set(cand.columns) == {"query_id", "doc_id"}
    pairs = [(r["query_id"], r["doc_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    per_q: dict = {}
    for q, d in pairs:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(v <= 7 for v in per_q.values())
    with pytest.raises(ValueError, match="must be >= k"):
        maxsim_search(dt, qt, k=10, n_candidates=5)


def test_two_stage_recall_at_realistic_probe(spark):
    """At a pruned probe the screen trades recall for never crossing
    the corpus; on random data recall@5 should still be high (the
    candidate score IS an approximation of MaxSim itself)."""
    from fabstir_vectordb_spark.operators.multivector import maxsim_search

    dt, qt, docs, queries = _tables(spark, n_docs=60, n_queries=3, seed=2)
    want = {
        (r["query_id"], r["doc_id"])
        for r in maxsim_topk(dt, qt, k=5).collect()
    }
    got = {
        (r["query_id"], r["doc_id"])
        for r in maxsim_search(
            dt, qt, k=5, n_candidates=20,
            token_k=16, n_probe=2, n_clusters=4,
        ).collect()
    }
    assert len(got & want) / len(want) >= 0.6


def test_candidates_prefit_assigned_and_prune(spark):
    """The deployment path: prefit index + pre-assigned layout +
    probed-cluster scan pruning must give the same shortlist as the
    self-contained call; assigned without index is refused."""
    from fabstir_vectordb_spark.operators.ivf import IVFIndex
    from fabstir_vectordb_spark.operators.multivector import (
        maxsim_candidates,
    )

    dt, qt, docs, queries = _tables(spark, n_docs=40, n_queries=2, seed=9)
    idx = IVFIndex.fit(dt, n_clusters=4, id_col="doc_id",
                       vector_col="vector")
    assigned = idx.assign(dt)
    kw = dict(n_candidates=10, token_k=8, n_probe=2)
    base = {(r["query_id"], r["doc_id"])
            for r in maxsim_candidates(dt, qt, index=idx, **kw).collect()}
    pre = {(r["query_id"], r["doc_id"])
           for r in maxsim_candidates(
               dt, qt, index=idx, assigned=assigned, **kw).collect()}
    nopr = {(r["query_id"], r["doc_id"])
            for r in maxsim_candidates(
                dt, qt, index=idx, assigned=assigned, prune_scan=False,
                **kw).collect()}
    assert base == pre == nopr
    with pytest.raises(ValueError, match="assigned requires"):
        maxsim_candidates(dt, qt, assigned=assigned, **kw)


def test_candidates_rejects_separator_in_query_ids(spark):
    """String query ids containing the 0x1f composite-key separator
    would collide; the documented rejection must actually fire."""
    dt, qt, docs, queries = _tables(spark, n_docs=6, n_queries=1)
    from fabstir_vectordb_spark.operators.multivector import (
        maxsim_candidates,
    )

    bad_q = qt.select(
        F.concat(F.lit("u\x1f"), F.col("query_id").cast("string"))
        .alias("query_id"),
        "token_idx", "vector",
    )
    with pytest.raises(Exception, match="separator"):
        maxsim_candidates(
            dt, bad_q, n_candidates=3, token_k=4, n_probe=1, n_clusters=2,
        ).collect()


def test_candidate_pushdown_identical_and_pushes_to_scan(spark, tmp_path):
    """candidate_pushdown: identical results, and the candidate-id
    filter REACHES the parquet scan (PushedFilters In(doc_id, ...)) so
    a doc_id-sorted layout can skip files/row groups; past the limit
    the bounded collect is skipped and the map-only semi-join shape is
    kept (still identical)."""
    # baseline for the leak check at the end: other suites may hold
    # their own legitimate caches in the shared session
    n_persisted_before = (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    )
    dt, qt, docs, queries = _tables(spark, n_docs=20)
    path = str(tmp_path / "dt.parquet")
    dt.sort("doc_id").write.parquet(path)
    dtp = spark.read.parquet(path)
    cand = spark.createDataFrame(
        [(q, d) for q in queries for d in list(docs)[:6]],
        "query_id long, doc_id long",
    )
    base = {
        (r["query_id"], r["doc_id"], r["rank"])
        for r in maxsim_topk(dtp, qt, 3, candidates=cand).collect()
    }
    pushed = maxsim_topk(
        dtp, qt, 3, candidates=cand, candidate_pushdown=100
    )
    got = {
        (r["query_id"], r["doc_id"], r["rank"])
        for r in pushed.collect()
    }
    assert got == base
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    seg = plan.split("PushedFilters")[1][:400]
    assert "In(doc_id" in seg, seg
    # over the limit: no filter (bulk shape), same rows
    bulk = maxsim_topk(
        dtp, qt, 3, candidates=cand, candidate_pushdown=2
    )
    assert {
        (r["query_id"], r["doc_id"], r["rank"]) for r in bulk.collect()
    } == base
    plan_bulk = bulk._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id" not in plan_bulk
    # kernel impl honors the same pushdown
    kern = maxsim_topk(
        dtp, qt, 3, candidates=cand, impl="kernel",
        candidate_pushdown=100,
    )
    assert {
        (r["query_id"], r["doc_id"], r["rank"]) for r in kern.collect()
    } == base
    with pytest.raises(ValueError, match="needs a candidates"):
        maxsim_topk(dtp, qt, 3, candidate_pushdown=10)
    with pytest.raises(ValueError, match="must be >= 1"):
        maxsim_topk(dtp, qt, 3, candidates=cand, candidate_pushdown=0)
    # the probe's persist is RELEASED before returning — a serving
    # loop calling this repeatedly must not accumulate cached plans
    # (compare against the pre-test count: the shared session may
    # carry other suites' caches)
    n_persisted_after = (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    )
    assert n_persisted_after <= n_persisted_before, (
        "candidate_pushdown leaked a persisted plan",
        n_persisted_before, n_persisted_after,
    )


def test_candidate_pushdown_respects_caller_cache(spark, tmp_path):
    """The probe's temporary persist must not evict a cache the
    CALLER created on the candidates frame (persist() on an
    already-cached plan is a no-op, so an unconditional unpersist
    would silently drop the caller's cache decision)."""
    dt, qt, docs, queries = _tables(spark, n_docs=12)
    cand = spark.createDataFrame(
        [(q, d) for q in queries for d in list(docs)[:4]],
        "query_id long, doc_id long",
    ).persist()
    try:
        cand.count()  # materialize the caller's cache
        out = maxsim_topk(
            dt, qt, 2, candidates=cand, candidate_pushdown=100
        )
        assert out.count() > 0
        lvl = cand.storageLevel
        assert lvl.useMemory or lvl.useDisk, (
            "caller's cache was evicted by the pushdown probe"
        )
    finally:
        cand.unpersist()
