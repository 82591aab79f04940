"""Vector-table sources and sinks (SURVEY §2.7).

The reference persists CBOR chunk files + a JSON manifest on S5 storage
(src/core/chunk.rs:38-97,236-342; src/hybrid/persistence.rs:188-277).
In Spark every concern collapses into the columnar table:

  chunk files        -> parquet files / row groups
  manifest           -> parquet footers (+ our manifest.json for session
                        metadata the footer can't carry)
  chunk_refs pruning -> partition pruning on cluster_id
  lazy chunk loads   -> lazy evaluation + file skipping
  CBOR + zstd        -> parquet + zstd page compression
  LRU chunk cache    -> block-manager cache (.cache()/persist)

The reference's storage decorators (CachedS5Storage / RetryS5Storage /
BatchS5Storage, src/storage/enhanced_s5_storage.rs:39-635) are
filesystem-layer concerns: retries/backoff live in the Hadoop FS
connector config, not in engine semantics.

This module is the typed boundary: read vector tables from
parquet/json/csv with a validated schema, and write them partitioned for
probe-time pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VECTOR_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
        T.StructField("metadata", T.StringType(), True),  # JSON string at rest
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("deleted", T.BooleanType(), True),
    ]
)


class SchemaError(ValueError):
    pass


def read_vectors(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    id_col: str = "id",
    vector_col: str = "vector",
    expected_dim: int | None = None,
) -> DataFrame:
    """Read a vector table and normalize to the engine schema.

    - parquet: read as-is (typed columns survive).
    - json/csv: `vector` arrives as a JSON-array string -> from_json cast.
    Dimension validation (session.rs:344-357) is a count of violating
    rows, surfaced as an error (cheap: one aggregate over size(vector)).
    """
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "json":
        df = spark.read.json(path)
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")

    if id_col != "id":
        df = df.withColumnRenamed(id_col, "id")
    if vector_col != "vector":
        df = df.withColumnRenamed(vector_col, "vector")

    vec_type = df.schema["vector"].dataType
    if isinstance(vec_type, T.StringType):
        df = df.withColumn("vector", F.from_json("vector", "array<float>"))
    elif isinstance(vec_type, T.ArrayType) and not isinstance(
        vec_type.elementType, T.FloatType
    ):
        df = df.withColumn("vector", F.col("vector").cast("array<float>"))

    if "deleted" not in df.columns:
        df = df.withColumn("deleted", F.lit(False))
    if "ts" not in df.columns:
        df = df.withColumn("ts", F.lit(None).cast("timestamp"))

    if expected_dim is not None:
        bad = df.filter(
            F.col("vector").isNull() | (F.size("vector") != expected_dim)
        ).count()
        if bad:
            raise SchemaError(
                f"{bad} rows violate expected dimension {expected_dim}"
            )
    return df


def validate_dim_uniform(df: DataFrame, vector_col: str = "vector") -> int:
    """Assert every vector has the same dimension; return it.

    The reference fixes dim at first insert (hnsw/core.rs:233-245); for a
    bulk-loaded table the equivalent check is one distinct over
    size(vector)."""
    dims = [r[0] for r in df.select(F.size(vector_col)).distinct().collect()]
    if len(dims) != 1:
        raise SchemaError(f"non-uniform vector dimensions: {sorted(dims)[:10]}")
    return dims[0]


def write_vectors(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write the vector table as (optionally partitioned) parquet.

    zstd mirrors the reference's zstd-compressed CBOR chunks
    (src/cbor/encoder.rs:42-61); partitioning by cluster_id is what turns
    n_probe search into a pruned scan."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def metadata_as_json(df: DataFrame, metadata_col: str = "metadata") -> DataFrame:
    """Struct metadata -> JSON string column (the wire form)."""
    return df.withColumn(metadata_col, F.to_json(metadata_col))


def metadata_from_json(
    df: DataFrame, schema: T.StructType | str, metadata_col: str = "metadata"
) -> DataFrame:
    """JSON string metadata -> typed struct (PERMISSIVE: bad rows null)."""
    return df.withColumn(metadata_col, F.from_json(metadata_col, schema))
