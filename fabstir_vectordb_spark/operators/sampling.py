"""Deterministic corpus splitting / sampling for training-data pipelines.

A 100 TB corpus needs train/val/test assignment and downsampling that
are (a) reproducible run-to-run, (b) stable under corpus growth — a
document's assignment must depend only on its id, never on partition
layout, row order, or corpus size — and (c) auditable cross-engine.

Both operators therefore derive a uniform 32-bit bucket from
``md5(id|salt)`` (first 8 hex digits), a pure column expression that any
SQL engine reproduces exactly (DuckDB: ``CAST(concat('0x', substr(
md5(...), 1, 8)) AS BIGINT)``) — no RNG, no seed state, no Spark-specific
hash.  md5 here is a uniformity device, not a security primitive.

The reference has no corpus-splitting surface (it is a vector DB); these
belong to the LLM-pipeline extension axis, certified by the
``corpus_filter`` driver query's split/sample columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = float(2**32)


def _bucket(id_col: Column, salt: str) -> Column:
    """Uniform [0, 2^32) bucket from md5(id|salt) — deterministic and
    engine-independent (conv is exact: 8 hex digits < 2^63)."""
    h = F.md5(F.concat_ws("|", id_col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def assign_split(
    df: DataFrame,
    weights: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add a train/val/test-style assignment column.

    ``weights``: ordered (name, weight) pairs; weights are normalized.
    Assignment: bucket/2^32 falls into the cumulative-weight interval.
    Growth-stable: adding documents never reassigns existing ones.
    """
    if weights is None:
        weights = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for _, w in weights):
        raise ValueError("weights must be nonnegative")
    total = sum(w for _, w in weights)
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    frac = _bucket(F.col(id_col), salt) / F.lit(_BUCKETS)
    expr = F.lit(weights[-1][0])  # last bin absorbs rounding
    acc = 0.0
    conds = []
    for name, w in weights[:-1]:
        acc += w / total
        conds.append((name, acc))
    for name, cum in reversed(conds):
        expr = F.when(frac < cum, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def sample_keep(id_col: Column | str, fraction: float, salt: str = "sample") -> Column:
    """Boolean keep-expression for deterministic downsampling — usable
    inline in a wider projection (no join, no second scan)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (_bucket(c, salt) / F.lit(_BUCKETS)) < fraction


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — reproducible,
    partition-independent, and consistent across engines (unlike
    ``DataFrame.sample``, whose output depends on partitioning)."""
    return df.filter(sample_keep(id_col, fraction, salt))
