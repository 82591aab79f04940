"""Filter-compiler semantics matrix (FIXTURES.md §3, mirroring the
reference's Node e2e suite bindings/node/test/search-filter.test.js)."""

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.functions.filters import (
    InvalidFilterError,
    UnsupportedOperatorError,
    compile_filter,
)

ROWS = [
    # id, category, published, views, score, tags, status, priority, user
    (0, "technology", True, 500, 0.9, ["ai", "ml"], "active", 9, {"id": "u3", "name": "ann"}),
    (1, "sports", False, 1500, 0.2, ["football"], "pending", 5, {"id": "u4", "name": "bob"}),
    (2, "technology", False, 3000, 0.5, [], "archived", 8, {"id": "u3", "name": "cat"}),
    (3, "science", True, 5000, 0.7, ["ai"], "active", 1, {"id": "u5", "name": "dan"}),
    (4, "arts", True, 8000, 0.1, ["web", "ai"], "pending", 10, {"id": "u6", "name": "eve"}),
    (5, "sports", True, 1000, 0.4, ["news"], "active", 8, {"id": "u3", "name": "fay"}),
]
SCHEMA = (
    "id int, category string, published boolean, views bigint, score double, "
    "tags array<string>, status string, priority int, "
    "user struct<id:string, name:string>"
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def ids(df, flt):
    pred = compile_filter(flt, df.schema)
    return sorted(r["id"] for r in df.filter(pred).select("id").collect())


CASES = [
    ({"category": "technology"}, [0, 2]),                       # eq_string
    ({"published": True}, [0, 3, 4, 5]),                        # eq_bool
    ({"tags": "ai"}, [0, 3, 4]),                                # eq_array_contains
    ({"status": {"$in": ["active", "pending"]}}, [0, 1, 3, 4, 5]),  # in_op
    ({"views": {"$gte": 1000, "$lte": 5000}}, [1, 2, 3, 5]),    # range_both
    ({"views": {"$gt": 1000, "$lt": 5000}}, [1, 2]),            # range_strict
    ({"priority": {"$gte": 8}}, [0, 2, 4, 5]),                  # range_open
    ({"category": {"$gte": 1}}, []),                            # range_non_numeric
    ({"$and": [{"category": "technology"}, {"published": True}]}, [0]),  # and_op
    ({"category": "technology", "published": False}, [2]),      # implicit_and
    ({"$or": [{"priority": {"$gte": 9}}, {"status": "archived"}]}, [0, 2, 4]),  # or_op
    ({"user.id": "u3"}, [0, 2, 5]),                             # nested_dot
    ({"nonexistent": "x"}, []),                                 # missing_field
    ({"$and": []}, [0, 1, 2, 3, 4, 5]),                         # empty_and
    ({"$or": []}, []),                                          # empty_or
    ({}, [0, 1, 2, 3, 4, 5]),                                   # empty filter
    ({"views": {"$in": [500, 3000]}}, [0, 2]),                  # numeric $in
    ({"views": 500}, [0]),                                      # int filter on bigint col
    ({"score": 0.9}, [0]),                                      # float equality
    ({"category": 5}, []),                                      # cross-type eq => false
    ({"published": {"$gte": 0}}, []),                           # bool is not a number
    ({"tags": {"$in": ["ai"]}}, []),                            # $in never unrolls arrays
    ({"user": {"id": "u3", "name": "ann"}}, [0]),               # object equality, exact keys
    ({"user": {"id": "u3"}}, []),                               # partial object != JSON equality
]


@pytest.mark.parametrize("flt,expected", CASES, ids=[str(c[0])[:50] for c in CASES])
def test_matrix(df, flt, expected):
    assert ids(df, flt) == expected


ERROR_CASES = [
    ({"$invalid": "x"}, UnsupportedOperatorError),
    ({"views": {"$regex": ".*"}}, UnsupportedOperatorError),
    ({"views": {}}, InvalidFilterError),
    ({"views": {"$gte": 1, "$gt": 2}}, InvalidFilterError),
    ({"views": {"$lte": 1, "$lt": 2}}, InvalidFilterError),
    ({"views": {"$gte": "abc"}}, InvalidFilterError),
    ({"status": {"$in": "active"}}, InvalidFilterError),
    ({"views": {"$in": [1], "$gte": 2}}, InvalidFilterError),
    ({"missing_field": {"$gte": 1, "$gt": 2}}, InvalidFilterError),  # validate before missing=>false
]


@pytest.mark.parametrize("flt,err", ERROR_CASES, ids=[str(c[0])[:40] for c in ERROR_CASES])
def test_errors(df, flt, err):
    with pytest.raises(err):
        compile_filter(flt, df.schema)


def test_filter_composes_with_search(df):
    # filter + threshold compose (search-filter.test.js:590)
    pred = compile_filter({"published": True, "views": {"$lt": 6000}}, df.schema)
    out = df.filter(pred & (F.col("score") >= 0.5)).select("id").collect()
    assert sorted(r["id"] for r in out) == [0, 3]


def test_metadata_col_prefix(spark):
    df = spark.createDataFrame(
        [(1, {"cat": "a", "n": 5}), (2, {"cat": "b", "n": 9})],
        "id int, metadata struct<cat:string, n:int>",
    )
    pred = compile_filter({"cat": "a"}, df.schema, metadata_col="metadata")
    assert [r["id"] for r in df.filter(pred).collect()] == [1]
    pred = compile_filter({"n": {"$gt": 6}}, df.schema, metadata_col="metadata")
    assert [r["id"] for r in df.filter(pred).collect()] == [2]
