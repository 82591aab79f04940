"""Scoring, merge, query-expansion, and aggregation-stats tests."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators import scoring as S
from fabstir_vectordb_spark.operators import stats as ST
from fabstir_vectordb_spark.operators.topk import merge_dedup, weighted_merge


def test_time_decay_score(spark):
    df = spark.createDataFrame(
        [(1.0, 0.0), (1.0, 1000.0), (0.5, 2000.0)], "score double, age_ms double"
    )
    out = df.select(
        S.time_decay_score("score", "age_ms", half_life_ms=1000.0).alias("s")
    ).collect()
    assert out[0]["s"] == pytest.approx(1.0)
    assert out[1]["s"] == pytest.approx(0.5)     # one half-life
    assert out[2]["s"] == pytest.approx(0.125)   # 0.5 * 0.25


def test_popularity_boost(spark):
    df = spark.createDataFrame([(1.0, 0.0), (1.0, 99.0)], "score double, views double")
    out = df.select(S.popularity_boost_score("score", "views").alias("s")).collect()
    assert out[0]["s"] == pytest.approx(1.0)
    assert out[1]["s"] == pytest.approx(1.0 + math.log(100.0) / 10.0)


def test_combined_score(spark):
    df = spark.createDataFrame([(0.8, 0.6)], "a double, b double")
    out = df.select(S.combined_score([("a", 0.75), ("b", 0.25)]).alias("s")).collect()
    assert out[0]["s"] == pytest.approx(0.8 * 0.75 + 0.6 * 0.25)
    with pytest.raises(ValueError):
        S.combined_score([])


def test_merge_dedup_keeps_min(spark):
    r1 = spark.createDataFrame(
        [("q", "a", 1.0), ("q", "b", 2.0)], "query_id string, id string, distance double"
    )
    r2 = spark.createDataFrame(
        [("q", "a", 0.5), ("q", "c", 3.0)], "query_id string, id string, distance double"
    )
    out = {r["id"]: r["distance"] for r in merge_dedup(r1, r2).collect()}
    assert out == {"a": 0.5, "b": 2.0, "c": 3.0}


def test_weighted_merge_strategies(spark):
    rows = [
        ("q", "a", 0.9, 1.0), ("q", "a", 0.5, 3.0),
        ("q", "b", 0.4, 1.0),
    ]
    df = spark.createDataFrame(rows, "query_id string, id string, score double, weight double")
    best = {r["id"]: r["score"] for r in weighted_merge(df, "take_best").collect()}
    assert best["a"] == pytest.approx(1.5)  # max(0.9*1, 0.5*3)
    avg = {r["id"]: r["score"] for r in weighted_merge(df, "average").collect()}
    assert avg["a"] == pytest.approx(0.7)
    wtd = {r["id"]: r["score"] for r in weighted_merge(df, "weighted").collect()}
    assert wtd["a"] == pytest.approx((0.9 * 1 + 0.5 * 3) / 4.0)
    with pytest.raises(ValueError):
        weighted_merge(df, "nope").collect()


def test_expand_queries_deterministic_and_unit(spark):
    q = spark.createDataFrame(
        [("q0", [1.0, 0.0, 0.0, 0.0])], "query_id string, vector array<float>"
    )
    out = S.expand_queries(q, n_expansions=3).collect()
    assert len(out) == 4
    by_exp = {r["expansion_id"]: r["vector"] for r in out}
    # expansion 0 is the original (unit-norm already)
    assert by_exp[0] == pytest.approx([1.0, 0.0, 0.0, 0.0])
    for e, v in by_exp.items():
        assert sum(x * x for x in v) == pytest.approx(1.0)  # renormalized
    # perturbed copies differ from the original
    assert by_exp[1] != pytest.approx(by_exp[0])
    # deterministic: second run identical
    again = {r["expansion_id"]: r["vector"] for r in S.expand_queries(q, n_expansions=3).collect()}
    for e in by_exp:
        assert by_exp[e] == pytest.approx(again[e])


NOW = dt.datetime(2026, 1, 10, 12, 0, 0)


def test_age_distribution_buckets(spark):
    rows = [
        (NOW - dt.timedelta(minutes=5),),   # under_1h
        (NOW - dt.timedelta(hours=5),),     # under_1d
        (NOW - dt.timedelta(days=3),),      # under_1w
        (NOW - dt.timedelta(days=30),),     # over_1w
        (NOW - dt.timedelta(days=30),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["bucket"]: r["n"] for r in ST.age_distribution(df, NOW).collect()}
    assert out == {"under_1h": 1, "under_1d": 1, "under_1w": 1, "over_1w": 2}


def test_cluster_stats(spark):
    df = spark.createDataFrame([(0,), (0,), (1,)], "cluster_id int")
    st = ST.cluster_stats(df, n_clusters=4)
    assert st["total_vectors"] == 3
    assert st["empty_clusters"] == 2
    assert st["avg_cluster_size"] == pytest.approx(0.75)
    # population variance over sizes [2,1,0,0]
    assert st["size_variance"] == pytest.approx(
        sum((s - 0.75) ** 2 for s in [2, 1, 0, 0]) / 4
    )


def test_percentile_stats_exact(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    r = ST.percentile_stats(df, "v").collect()[0]
    assert r["n"] == 100
    assert r["mean"] == pytest.approx(50.5)
    assert r["p50"] == pytest.approx(50.5)   # interpolated median
    assert r["p99"] == pytest.approx(99.01)  # 1 + 0.99*99


def test_percentile_stats_approx_matches_exact(spark):
    """The bounded-memory sketch path (the 100 TB configuration) must
    agree with the exact sorted definition within rank tolerance."""
    df = spark.createDataFrame([(float(i),) for i in range(1, 2001)], "v double")
    exact = ST.percentile_stats(df, "v").collect()[0]
    approx = ST.percentile_stats(df, "v", approx=True, accuracy=10_000).collect()[0]
    assert approx["n"] == exact["n"]
    # rank error <= n/accuracy = 0.2 ranks -> values within one step
    assert abs(approx["p50"] - exact["p50"]) <= 1.0
    assert abs(approx["p99"] - exact["p99"]) <= 1.0


# ----------------------------------------------------------------- MMR

def test_mmr_rerank_diversifies(spark):
    import numpy as np

    from fabstir_vectordb_spark.operators.scoring import mmr_rerank

    # two tight clusters of candidates; pure relevance would take the
    # whole first cluster, MMR must interleave
    vecs = [
        (1, [1.0, 0.0]), (2, [0.99, 0.01]), (3, [0.98, 0.02]),
        (4, [0.0, 1.0]), (5, [0.01, 0.99]),
    ]
    vectors = spark.createDataFrame(vecs, "id long, vector array<double>")
    results = spark.createDataFrame(
        [("q", 1, 0.99), ("q", 2, 0.98), ("q", 3, 0.97),
         ("q", 4, 0.90), ("q", 5, 0.89)],
        "query_id string, id long, score double",
    )
    out = (
        mmr_rerank(results, vectors, k=3, lam=0.5)
        .orderBy("rank")
        .collect()
    )
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["id"] == 1          # rank 1 = max relevance always
    assert out[1]["id"] == 4          # second pick crosses clusters
    picked = {r["id"] for r in out}
    assert picked & {4, 5}            # diversity enforced
    # lam=1.0 degenerates to pure relevance order
    pure = mmr_rerank(results, vectors, k=3, lam=1.0).orderBy("rank").collect()
    assert [r["id"] for r in pure] == [1, 2, 3]


def test_mmr_deterministic_and_bounded(spark):
    import numpy as np

    from fabstir_vectordb_spark.operators.scoring import mmr_rerank

    rng = np.random.default_rng(2)
    vectors = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(30)],
        "id long, vector array<double>",
    )
    results = spark.createDataFrame(
        [(f"q{j}", i, float((i * 7 + j) % 13) / 13.0)
         for j in range(3) for i in range(30)],
        "query_id string, id long, score double",
    )
    a = sorted(map(tuple, mmr_rerank(results, vectors, 10).collect()))
    b = sorted(map(tuple, mmr_rerank(results.repartition(5), vectors, 10).collect()))
    assert a == b
    from collections import Counter

    cnt = Counter(q for q, *_ in a)
    assert all(v == 10 for v in cnt.values())


def test_mmr_rerank_multi_matches_per_lam(spark):
    """mmr_rerank_multi(lams=[...]) must equal mmr_rerank per lam exactly
    — the shared-join/shared-sim-matrix consolidation (optimization r11)
    may not change a single row."""
    import numpy as np

    from fabstir_vectordb_spark.operators.scoring import (
        mmr_rerank,
        mmr_rerank_multi,
    )

    rng = np.random.default_rng(7)
    vectors = spark.createDataFrame(
        [(i, rng.normal(size=6).tolist()) for i in range(25)],
        "id long, vector array<double>",
    )
    results = spark.createDataFrame(
        [(f"q{j}", i, float((i * 5 + j) % 11) / 11.0)
         for j in range(4) for i in range(25)],
        "query_id string, id long, score double",
    )
    multi = mmr_rerank_multi(results, vectors, 8, lams=[1.0, 0.5, 0.7])
    for lam in (1.0, 0.5, 0.7):
        single = sorted(
            map(tuple, mmr_rerank(results, vectors, 8, lam=lam).collect())
        )
        part = sorted(
            map(
                tuple,
                multi.filter(f"lam = {lam}")
                .select("query_id", "id", "mmr_score", "rank")
                .collect(),
            )
        )
        assert part == single
