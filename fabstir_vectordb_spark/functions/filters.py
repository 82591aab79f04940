"""MongoDB-style metadata filter compiler -> Catalyst Column predicates.

Parity target: the reference's only intermediate representation —
`MetadataFilter` (src/core/metadata_filter.rs:32-59), parser `from_json`
(:86-252), evaluator `matches` (:270-335), dot-path field access
(:359-373).  Semantics reproduced exactly:

  {f: v}                 equality; if the STORED field is an array,
                         true iff v is an element (:272-283)
  {f: {"$in": [...]}}    membership (:285-291)
  {f: {"$gt"/"$gte"/"$lt"/"$lte": n}}
                         numeric compare via f64 coercion; non-numeric
                         stored field => false (:293-317); $gte with $gt
                         (or $lte with $lt) is a parse error (:172-177)
  {"$and": [...]}        all match; empty AND => TRUE (:319-325)
  {"$or":  [...]}        any match; empty OR => FALSE (:327-333)
  {f1: v1, f2: v2}       implicit AND (:111-116)
  "a.b.c"                dot-path into nested objects; missing => false
  unknown "$op"          UnsupportedOperatorError (:99-103,205-216)
  {f: {}}                InvalidFilterError (:218-223)

Compilation (not row-at-a-time evaluation) is the Spark-first win: the
resulting Column predicate is pushed by Catalyst below ranking and into
the parquet scan, superseding the reference's k*3 oversampling
post-filter (src/hybrid/core.rs:513-549).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class FilterError(ValueError):
    """Base for filter-compilation errors."""


class UnsupportedOperatorError(FilterError):
    pass


class InvalidFilterError(FilterError):
    pass


_RANGE_OPS = {"$gt", "$gte", "$lt", "$lte"}
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC_TYPES = _INTEGRAL_TYPES + (
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _resolve(path: str, schema: T.StructType) -> tuple[str, T.DataType] | None:
    """Walk a dot path through nested structs; None if any segment is missing."""
    parts = path.split(".")
    cur: T.DataType = schema
    resolved: list[str] = []
    for p in parts:
        if not isinstance(cur, T.StructType):
            return None
        try:
            field = cur[p]
        except KeyError:
            return None
        resolved.append(p)
        cur = field.dataType
    return ".".join(f"`{s}`" for s in resolved), cur


def _is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _eq_predicate(col: Column, dtype: T.DataType, value: Any) -> Column:
    """JSON-equality semantics, dispatched on the STORED column type."""
    if isinstance(dtype, T.ArrayType):
        # array-contains equality (metadata_filter.rs:274-279)
        elem = dtype.elementType
        if isinstance(value, (list, dict)):
            return F.lit(False)  # array/object element equality: not reachable in dialect
        return _typed_eq(F.lit(None), elem, value, contains_in=col)
    return _typed_eq(col, dtype, value)


def _typed_eq(
    col: Column, dtype: T.DataType, value: Any, contains_in: Column | None = None
) -> Column:
    """Equality with JSON type rules: number==number (int/float merged),
    string==string, bool==bool; cross-type => false."""
    if value is None:
        target = contains_in if contains_in is not None else col
        if contains_in is not None:
            return F.lit(False)  # JSON null never equals an array element here
        return target.isNull()
    if isinstance(value, bool):
        ok = isinstance(dtype, T.BooleanType)
        lit = F.lit(value)
    elif _is_number(value):
        ok = isinstance(dtype, _NUMERIC_TYPES)
        lit = F.lit(float(value))
        col = col.cast("double") if ok and contains_in is None else col
    elif isinstance(value, str):
        ok = isinstance(dtype, T.StringType)
        lit = F.lit(value)
    else:
        return F.lit(False)
    if not ok:
        return F.lit(False)
    if contains_in is not None:
        if _is_number(value):
            return F.array_contains(
                F.transform(contains_in, lambda x: x.cast("double")), lit
            )
        return F.array_contains(contains_in, lit)
    return col == lit


def _in_predicate(col: Column, dtype: T.DataType, values: Any) -> Column:
    if not isinstance(values, list):
        raise InvalidFilterError("$in requires a list")
    if not values:
        return F.lit(False)
    preds = [_eq_scalar_only(col, dtype, v) for v in values]
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def _eq_scalar_only(col: Column, dtype: T.DataType, value: Any) -> Column:
    # $in compares the whole stored value against each list element
    # (metadata_filter.rs:285-291) — no array-contains unrolling.
    if isinstance(dtype, T.ArrayType):
        return F.lit(False)
    return _typed_eq(col, dtype, value)


def _range_predicate(col: Column, dtype: T.DataType, spec: dict) -> Column:
    if "$gt" in spec and "$gte" in spec:
        raise InvalidFilterError("cannot combine $gt and $gte")
    if "$lt" in spec and "$lte" in spec:
        raise InvalidFilterError("cannot combine $lt and $lte")
    for op, v in spec.items():
        if not _is_number(v):
            raise InvalidFilterError(f"{op} bound must be numeric, got {v!r}")
    if not isinstance(dtype, _NUMERIC_TYPES):
        # f64 coercion of a non-numeric field fails => no match (:310-312)
        return F.lit(False)
    if isinstance(dtype, _INTEGRAL_TYPES) and all(
        abs(float(v)) < 2**62 for v in spec.values()
    ):
        # cast-free integral compare: `cast(col as double) >= 100.0`
        # blocks parquet-native predicate pushdown, while `col >= 100` is
        # pushable and exactly equivalent (fractional bounds transpose to
        # the neighboring integer: x > 2.5 <=> x > floor(2.5))
        import math

        pred = F.lit(True)
        if "$gt" in spec:
            pred = pred & (col > int(math.floor(float(spec["$gt"]))))
        if "$gte" in spec:
            pred = pred & (col >= int(math.ceil(float(spec["$gte"]))))
        if "$lt" in spec:
            pred = pred & (col < int(math.ceil(float(spec["$lt"]))))
        if "$lte" in spec:
            pred = pred & (col <= int(math.floor(float(spec["$lte"]))))
        return pred
    c = col.cast("double")
    pred = F.lit(True)
    if "$gt" in spec:
        pred = pred & (c > float(spec["$gt"]))
    if "$gte" in spec:
        pred = pred & (c >= float(spec["$gte"]))
    if "$lt" in spec:
        pred = pred & (c < float(spec["$lt"]))
    if "$lte" in spec:
        pred = pred & (c <= float(spec["$lte"]))
    return pred


def _field_predicate(path: str, spec: Any, schema: T.StructType, prefix: str) -> Column:
    full = f"{prefix}{path}"
    resolved = _resolve(full, schema)
    if isinstance(spec, dict) and any(k.startswith("$") for k in spec):
        ops = set(spec)
        unknown = {k for k in ops if k.startswith("$")} - _RANGE_OPS - {"$in"}
        if unknown:
            raise UnsupportedOperatorError(f"unsupported operator(s) {sorted(unknown)}")
        if "$in" in ops and ops - {"$in"}:
            raise InvalidFilterError("$in cannot be combined with other operators")
        if resolved is None:
            # still validate the spec so invalid filters raise even when
            # the field is absent, then match nothing
            if "$in" not in ops:
                _range_predicate(F.lit(None), T.DoubleType(), spec)
            return F.lit(False)
        name, dtype = resolved
        col = F.col(name)
        if "$in" in ops:
            return _in_predicate(col, dtype, spec["$in"])
        return _range_predicate(col, dtype, spec)
    if isinstance(spec, dict):
        if not spec:
            raise InvalidFilterError(f"empty filter object for field {path!r}")
        # object equality without $ ops: JSON equality on the nested object —
        # expressed as exact-keys AND of per-key equality
        if resolved is None:
            return F.lit(False)
        _, dtype = resolved
        if not isinstance(dtype, T.StructType) or set(spec) != set(dtype.fieldNames()):
            return F.lit(False)
        sub = [
            _field_predicate(f"{path}.{k}", v, schema, prefix) for k, v in spec.items()
        ]
        out = sub[0]
        for p in sub[1:]:
            out = out & p
        return out
    if resolved is None:
        return F.lit(False)  # missing field => false (:280-282)
    name, dtype = resolved
    return _eq_predicate(F.col(name), dtype, spec)


def compile_filter(
    filter_json: dict | None,
    schema: T.StructType,
    metadata_col: str | None = None,
) -> Column:
    """Compile a Mongo-dialect filter dict into a Column predicate.

    ``metadata_col``: resolve field paths under this struct column
    (session layout); None = fields are top-level columns.
    """
    if filter_json is None:
        return F.lit(True)
    if not isinstance(filter_json, dict):
        raise InvalidFilterError("filter must be a JSON object")
    prefix = f"{metadata_col}." if metadata_col else ""
    return _compile(filter_json, schema, prefix)


def _compile(node: dict, schema: T.StructType, prefix: str) -> Column:
    preds: list[Column] = []
    for key, spec in node.items():
        if key == "$and":
            if not isinstance(spec, list):
                raise InvalidFilterError("$and requires a list")
            sub = [_compile(s, schema, prefix) for s in spec]
            p = F.lit(True)  # empty AND is vacuously true (:320-323)
            for s in sub:
                p = p & s
            preds.append(p)
        elif key == "$or":
            if not isinstance(spec, list):
                raise InvalidFilterError("$or requires a list")
            sub = [_compile(s, schema, prefix) for s in spec]
            p = F.lit(False)  # empty OR matches nothing (:328-331)
            for s in sub:
                p = p | s
            preds.append(p)
        elif key.startswith("$"):
            raise UnsupportedOperatorError(f"unsupported operator {key!r}")
        else:
            preds.append(_field_predicate(key, spec, schema, prefix))
    if not preds:
        return F.lit(True)  # {} matches everything
    out = preds[0]
    for p in preds[1:]:
        out = out & p  # implicit AND (:111-116)
    return out
