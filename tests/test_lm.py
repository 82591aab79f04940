"""Bigram-LM scoring: counts, smoothing arithmetic, edge docs, and
corpus-typicality ordering on a planted fixture."""

import math

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.lm import BigramLM, bigram_lm_score


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "a b a b a b"),        # typical: the corpus-dominant pattern
        (1, "a b a b"),
        (2, "a b a b a b a b"),
        (3, "x y z q"),            # atypical: rare bigrams
        (4, "a"),                  # < 2 tokens: no bigrams
        (5, ""),                   # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fit_counts(spark, corpus):
    lm = BigramLM.fit(corpus, k=0.5)
    big = {(r["w1"], r["w2"]): r["c12"] for r in lm.bigrams.collect()}
    # 'a b' appears 3 + 2 + 4 = 9 times; 'b a' 2 + 1 + 3 = 6
    assert big[("a", "b")] == 9
    assert big[("b", "a")] == 6
    assert big[("x", "y")] == 1
    ctx = {r["w1"]: r["cctx"] for r in lm.contexts.collect()}
    assert ctx["a"] == 9
    assert ctx["b"] == 6
    # vocab: a b x y z q + '' (empty-text token from split(''))
    assert lm.vocab.collect()[0]["v"] == 7


def test_score_arithmetic_and_edges(spark, corpus):
    scored = {r["id"]: r["lm_score"] for r in bigram_lm_score(corpus, k=0.5).collect()}
    # every doc present; <2-token docs score NULL (no bigram evidence) so
    # a low-tail gate DROPS them instead of always keeping a 0.0 sentinel
    # that sits above every real mean ln-probability (ADVICE r5)
    assert set(scored) == {0, 1, 2, 3, 4, 5}
    assert scored[4] is None and scored[5] is None
    # doc 1 = 'a b a b': bigrams ab, ba, ab
    v = 7.0
    p_ab = (9 + 0.5) / (9 + 0.5 * v)
    p_ba = (6 + 0.5) / (6 + 0.5 * v)
    want = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert scored[1] == pytest.approx(want, abs=1e-12)
    # typicality ordering: dominant-pattern docs beat the rare-bigram doc
    assert min(scored[0], scored[1], scored[2]) > scored[3]


def test_score_unseen_text_floors(spark, corpus):
    lm = BigramLM.fit(corpus, k=0.5)
    new = spark.createDataFrame([(10, "zz qq zz")], "doc_id long, text string")
    got = lm.score(new).collect()[0]["lm_score"]
    # both bigrams unseen, contexts unseen: ln(k / (0 + k*V)) = -ln(V)
    assert got == pytest.approx(-math.log(7.0), abs=1e-12)


def test_distributed_shape(spark, corpus):
    plan = bigram_lm_score(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
