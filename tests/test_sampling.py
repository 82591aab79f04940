"""Deterministic split/sample: reproducibility, growth stability,
proportions, and partition independence."""

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.sampling import (
    assign_split,
    deterministic_sample,
    sample_keep,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(10_000).select(F.col("id").alias("doc_id"))


def test_split_proportions_and_determinism(ids):
    out = assign_split(ids)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 10_000 == pytest.approx(0.9, abs=0.02)
    assert counts["val"] / 10_000 == pytest.approx(0.05, abs=0.01)
    assert counts["test"] / 10_000 == pytest.approx(0.05, abs=0.01)
    again = {r["doc_id"]: r["split"] for r in assign_split(ids).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_split_growth_stable(spark, ids):
    """Adding documents must never reassign existing ones."""
    small = assign_split(ids.filter("doc_id < 1000"))
    big = assign_split(ids)
    s = {r["doc_id"]: r["split"] for r in small.collect()}
    b = {r["doc_id"]: r["split"] for r in big.filter("doc_id < 1000").collect()}
    assert s == b


def test_split_partition_independent(ids):
    a = {r["doc_id"]: r["split"] for r in assign_split(ids.repartition(1)).collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(ids.repartition(17)).collect()}
    assert a == b


def test_split_custom_weights_and_validation(ids):
    out = assign_split(ids, weights=[("a", 1.0), ("b", 3.0)])
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert counts["b"] / 10_000 == pytest.approx(0.75, abs=0.02)
    with pytest.raises(ValueError):
        assign_split(ids, weights=[])
    with pytest.raises(ValueError):
        assign_split(ids, weights=[("a", 0.0)])
    with pytest.raises(ValueError, match="nonnegative"):
        assign_split(ids, weights=[("a", 1.5), ("b", -0.5)])


def test_deterministic_sample(ids):
    kept = deterministic_sample(ids, 0.25)
    n = kept.count()
    assert n / 10_000 == pytest.approx(0.25, abs=0.02)
    # a sample of a superset contains the sample of the subset
    sub = deterministic_sample(ids.filter("doc_id < 1000"), 0.25)
    assert sub.count() == kept.filter("doc_id < 1000").count()
    # disjoint salts give (near-)independent draws, same salt identical
    again = set(r["doc_id"] for r in deterministic_sample(ids, 0.25).collect())
    assert again == set(r["doc_id"] for r in kept.collect())
    with pytest.raises(ValueError):
        sample_keep("doc_id", 1.5)
