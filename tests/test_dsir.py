"""DSIR importance resampling (operators/dsir.py — Xie et al. 2023).

The method contract under test: documents drawn from the target
distribution must out-score background documents, Gumbel top-k must be
deterministic and temperature-consistent, and evidence-free documents
(< n tokens) must be NULL-scored and never selected."""

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.dsir import (
    dsir_score,
    dsir_select,
    fit_dsir_ratios,
)

B = 256


@pytest.fixture(scope="module")
def corpus(spark):
    """Two disjoint vocabularies: docs 0..39 speak A (the target
    style), docs 40..119 speak B.  Bigrams from the two styles land in
    (almost surely) different hash buckets, so the log-ratio separates
    them sharply."""
    rows = []
    for i in range(40):
        rows.append((i, " ".join(f"alpha{j % 7} beta{(i + j) % 5}" for j in range(6))))
    for i in range(40, 120):
        rows.append((i, " ".join(f"gamma{j % 7} delta{(i + j) % 5}" for j in range(6))))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def scored(corpus):
    target = corpus.filter(F.col("doc_id") < 20)  # half of style A
    ratios = fit_dsir_ratios(target, corpus, n=2, num_buckets=B, k=0.5)
    return dsir_score(corpus, ratios, n=2, num_buckets=B).cache()


def test_ratio_table_is_dense(corpus):
    target = corpus.filter(F.col("doc_id") < 20)
    ratios = fit_dsir_ratios(target, corpus, n=2, num_buckets=B, k=0.5)
    assert ratios.count() == B
    assert ratios.select("bucket").distinct().count() == B
    # unseen-on-both-sides buckets exist in this tiny corpus and their
    # ratio is the pure smoothing ratio ln(kB_t) - ln(kB_r) — a
    # constant, never NULL/inf
    assert ratios.filter(F.col("log_ratio").isNull()).count() == 0


def test_target_style_outscores_background(scored):
    rows = {r["id"]: r["dsir_score"] for r in scored.collect()}
    a = [rows[i] for i in range(40)]
    b = [rows[i] for i in range(40, 120)]
    assert min(a) > max(b)  # disjoint vocabularies: clean separation
    # held-out target-style docs (20..39, not in the fit) score like
    # the fitted ones — the estimator generalizes over the style, not
    # the documents
    assert min(rows[i] for i in range(20, 40)) > max(b)


def test_selection_prefers_target_style(scored):
    sel = dsir_select(scored, k_keep=30, temperature=0.05)
    picked = {r["id"] for r in sel.filter("selected").collect()}
    assert len(picked) == 30
    # at near-zero temperature the Gumbel noise is negligible: the
    # selection is the top-30 by score = 30 of the 40 style-A docs
    assert picked <= set(range(40))


def test_selection_deterministic_across_runs(scored):
    a = {r["id"] for r in dsir_select(scored, 25, temperature=1.0)
         .filter("selected").collect()}
    b = {r["id"] for r in dsir_select(scored.repartition(7), 25, temperature=1.0)
         .filter("selected").collect()}
    assert a == b  # pure function of (id, score): partitioning-invariant


def test_short_docs_null_scored_and_never_selected(spark, corpus):
    extra = spark.createDataFrame(
        [(900, "single"), (901, "")], "doc_id long, text string"
    )
    docs = corpus.unionByName(extra)
    target = docs.filter(F.col("doc_id") < 20)
    ratios = fit_dsir_ratios(target, docs, n=2, num_buckets=B, k=0.5)
    sel = dsir_select(dsir_score(docs, ratios, n=2, num_buckets=B), k_keep=1000)
    rows = {r["id"]: r for r in sel.collect()}
    for sid in (900, 901):
        assert rows[sid]["dsir_score"] is None
        assert rows[sid]["dsir_key"] is None
        assert rows[sid]["selected"] is False
    # with k_keep >= corpus size every evidenced doc is selected
    assert sum(1 for r in rows.values() if r["selected"]) == 120


def test_gumbel_actually_resamples(scored):
    """At moderate temperature the draw is stochastic-looking (some
    non-top-score doc gets in), yet still deterministic — the defining
    difference from a plain top-k."""
    by_score = [r["id"] for r in scored.orderBy(
        F.desc(F.round("dsir_score", 6)), "id").limit(25).collect()]
    sel = {r["id"] for r in dsir_select(scored, 25, temperature=5.0)
           .filter("selected").collect()}
    assert sel != set(by_score)  # noise moved the boundary
    assert len(sel) == 25


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        fit_dsir_ratios(df, df, n=0)
    with pytest.raises(ValueError):
        fit_dsir_ratios(df, df, k=0.0)
    with pytest.raises(ValueError):
        fit_dsir_ratios(df, df, num_buckets=0)
    scored = df.select(F.col("doc_id").alias("id"), F.lit(0.0).alias("dsir_score"))
    with pytest.raises(ValueError):
        dsir_select(scored, k_keep=-1)
    with pytest.raises(ValueError):
        dsir_select(scored, k_keep=1, temperature=0.0)


def test_fraction_mode_matches_topk_at_scale_free_cut(scored):
    """keep_fraction is the no-global-sort scale path: its threshold
    filter must agree with the exact top-k at the same cut (up to the
    quantile's documented tolerance) and never select NULL keys."""
    n = scored.count()
    exact = dsir_select(scored, k_keep=n // 4, temperature=1.0)
    frac = dsir_select(scored, keep_fraction=0.25, temperature=1.0)
    e = {r["id"] for r in exact.filter("selected").collect()}
    f = {r["id"] for r in frac.filter("selected").collect()}
    # same cut point, approximate count: overlap must dominate
    assert len(e & f) >= int(0.9 * len(e))
    assert abs(len(f) - len(e)) <= max(3, int(0.1 * len(e)))


def test_fraction_mode_validation(scored):
    with pytest.raises(ValueError):
        dsir_select(scored)  # neither rule
    with pytest.raises(ValueError):
        dsir_select(scored, k_keep=5, keep_fraction=0.5)  # both
    with pytest.raises(ValueError):
        dsir_select(scored, keep_fraction=0.0)
    with pytest.raises(ValueError):
        dsir_select(scored, keep_fraction=1.5)


def test_ngram_range_unigram_plus_bigram(spark, corpus):
    """The DSIR paper's feature set: n=(1, 2) pools unigrams AND
    bigrams.  Separation still holds, and a one-token doc now HAS
    evidence (a unigram) instead of a NULL score."""
    docs = corpus.unionByName(
        spark.createDataFrame([(950, "alpha0")], "doc_id long, text string")
    )
    target = docs.filter(F.col("doc_id") < 20)
    ratios = fit_dsir_ratios(target, docs, n=(1, 2), num_buckets=B, k=0.5)
    scored = {r["id"]: r["dsir_score"]
              for r in dsir_score(docs, ratios, n=(1, 2), num_buckets=B).collect()}
    a = [scored[i] for i in range(40)]
    b = [scored[i] for i in range(40, 120)]
    assert min(a) > max(b)
    assert scored[950] is not None          # unigram evidence at order 1
    assert scored[950] > max(b)             # and it's target-flavored
    import pytest

    with pytest.raises(ValueError):
        fit_dsir_ratios(target, docs, n=(2, 1))
    with pytest.raises(ValueError):
        fit_dsir_ratios(target, docs, n=(0, 2))
