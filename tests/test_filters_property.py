"""Property-based filter-compiler tests (SURVEY §5 adopt #4).

Strategy: a pure-Python reference evaluator implements the semantics of
the reference's MetadataFilter::matches (metadata_filter.rs:270-373):

  equality       exact value; stored array => membership (:272-283)
  $in            stored value (whole) in list (:285-291)
  ranges         f64 coercion; non-numeric stored value => false;
                 booleans are NOT numbers (:293-317 via as_f64)
  $and           all match; empty => true (:319-325)
  $or            any match; empty => false (:327-333)
  implicit and   multi-key object (:111-116)
  dot paths      nested navigation; missing segment => false (:359-373)

Hypothesis generates random filters over a fixed fixture table; the
compiled Catalyst predicate must select exactly the rows the reference
evaluator accepts.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fabstir_vectordb_spark.functions.filters import compile_filter

# ---------------------------------------------------------------- fixture

ROWS = [
    # id, views(long), score(double), category, published, tags, user{id}
    (0, 500, 0.1, "technology", True, ["ai", "ml"], {"id": "u0"}),
    (1, 1000, 0.5, "sports", False, ["football"], {"id": "u1"}),
    (2, 3000, 0.9, "science", True, [], {"id": "u2"}),
    (3, 5000, 0.5, "arts", False, ["ai"], {"id": "u0"}),
    (4, 0, 1.0, "technology", True, ["web", "ai", "news"], {"id": "u3"}),
    (5, 99999, 0.0, "science", False, ["robotics"], {"id": "u1"}),
    (6, 42, 0.25, "sports", True, ["news"], None),
    (7, 7, 0.75, "arts", True, None, {"id": "u2"}),
]
SCHEMA = (
    "id bigint, views bigint, score double, category string, "
    "published boolean, tags array<string>, user struct<id:string>"
)


def row_dict(r):
    return {
        "views": r[1], "score": r[2], "category": r[3],
        "published": r[4], "tags": r[5], "user": r[6],
    }


# ------------------------------------------------- reference evaluator


def _get_path(row: dict | None, path: str):
    cur = row
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None, False
        cur = cur[part]
    return cur, True


def _as_f64(v):
    # as_f64 (metadata_filter.rs:295): numbers only; bool is NOT a number
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return None
    return float(v)


def _eq(stored, value):
    if stored is None:
        return False
    if isinstance(stored, list):
        return value in stored  # array-contains (:274-279)
    if isinstance(stored, bool) != isinstance(value, bool):
        return False
    if isinstance(stored, (int, float)) and isinstance(value, (int, float)):
        return float(stored) == float(value)
    return stored == value


def ref_matches(flt: dict, row: dict) -> bool:
    for key, spec in flt.items():
        if key == "$and":
            if not all(ref_matches(f, row) for f in spec):
                return False
        elif key == "$or":
            if not any(ref_matches(f, row) for f in spec):
                return False
        else:
            stored, found = _get_path(row, key)
            if isinstance(spec, dict) and any(k.startswith("$") for k in spec):
                if "$in" in spec:
                    if not found or stored is None or isinstance(stored, list):
                        return False
                    if not any(_eq_scalar(stored, v) for v in spec["$in"]):
                        return False
                else:  # range
                    f = _as_f64(stored) if found else None
                    if f is None:
                        return False
                    if "$gt" in spec and not f > float(spec["$gt"]):
                        return False
                    if "$gte" in spec and not f >= float(spec["$gte"]):
                        return False
                    if "$lt" in spec and not f < float(spec["$lt"]):
                        return False
                    if "$lte" in spec and not f <= float(spec["$lte"]):
                        return False
            else:
                if not found or not _eq(stored, spec):
                    return False
    return True


def _eq_scalar(stored, value):
    if isinstance(stored, bool) != isinstance(value, bool):
        return False
    if isinstance(stored, (int, float)) and isinstance(value, (int, float)):
        return float(stored) == float(value)
    return stored == value


# ------------------------------------------------------- filter strategy

_string_vals = st.sampled_from(
    ["technology", "sports", "science", "arts", "nonsense", "ai", "u0", "u1"]
)
_num_vals = st.sampled_from([0, 7, 42, 500, 1000, 3000, 5000, 99999, 0.5, 0.25, 1.0, -3, 2.5])
_bool_vals = st.booleans()

_leaf = st.one_of(
    st.tuples(st.just("category"), _string_vals),
    st.tuples(st.just("views"), _num_vals),
    st.tuples(st.just("score"), _num_vals),
    st.tuples(st.just("published"), _bool_vals),
    st.tuples(st.just("tags"), _string_vals),       # array-contains equality
    st.tuples(st.just("user.id"), _string_vals),    # dot path
    st.tuples(st.just("user.missing"), _string_vals),
    st.tuples(st.just("absent"), _string_vals),
)


def _leaf_filter(draw):
    field, val = draw(_leaf)
    kind = draw(st.sampled_from(["eq", "in", "range"]))
    if kind == "eq":
        return {field: val}
    if kind == "in":
        vals = draw(st.lists(_string_vals if isinstance(val, str) else _num_vals,
                             min_size=0, max_size=3))
        return {field: {"$in": vals}}
    lo = draw(_num_vals)
    hi = draw(_num_vals)
    ops = {}
    if draw(st.booleans()):
        ops[draw(st.sampled_from(["$gt", "$gte"]))] = lo
    if draw(st.booleans()) or not ops:
        ops[draw(st.sampled_from(["$lt", "$lte"]))] = hi
    return {field: ops}


@st.composite
def filters(draw, depth=2):
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        return _leaf_filter(draw)
    kind = draw(st.sampled_from(["$and", "$or", "implicit"]))
    n = draw(st.integers(0, 3))
    subs = [draw(filters(depth=depth - 1)) for _ in range(n)]
    if kind == "implicit":
        merged: dict = {}
        for s in subs:
            merged.update(s)
        return merged if merged else _leaf_filter(draw)
    return {kind: subs}


# ---------------------------------------------------------------- tests


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(flt=filters())
def test_compiled_filter_matches_reference(fixture_df, flt):
    expected = {r[0] for r in ROWS if ref_matches(flt, row_dict(r))}
    pred = compile_filter(flt, fixture_df.schema)
    got = {r["id"] for r in fixture_df.filter(pred).select("id").collect()}
    assert got == expected, f"filter={flt!r}"


def test_known_edge_cases(fixture_df):
    cases = [
        {"$and": []},                        # vacuous true
        {"$or": []},                         # vacuous false
        {"tags": "ai"},                      # array-contains
        {"user.id": "u0"},                   # dot path
        {"user.missing": "x"},               # missing nested => false
        {"absent": {"$gte": 0}},             # missing field range => false
        {"published": {"$gte": 0}},          # bool is not a number
        {"views": {"$gte": 0.5}},            # fractional bound on integral col
        {"views": {"$lt": 2.5}},
        {"$or": [{"$and": []}, {"absent": "x"}]},  # nested vacuous
    ]
    for flt in cases:
        expected = {r[0] for r in ROWS if ref_matches(flt, row_dict(r))}
        got = {
            r["id"]
            for r in fixture_df.filter(compile_filter(flt, fixture_df.schema))
            .select("id")
            .collect()
        }
        assert got == expected, f"filter={flt!r}"
