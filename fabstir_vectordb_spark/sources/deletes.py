"""Merge-on-read deletes for the persisted vector table (SURVEY §2.5/2.7).

The reference soft-deletes in memory (is_deleted flags,
hybrid/core.rs:904-936) and persists `deleted_vectors` in the manifest
(core/chunk.rs:236-342), physically removing rows only at vacuum
(hybrid/core.rs:989-1011).  The table-format equivalent — and the only
shape that works at 100 TB, where rewriting the table per delete is
unthinkable — is a deletes sidecar:

  delete   = append a tiny parquet of ids under {table}/_deletes/
             (O(ids) write, zero touch of the base table)
  read     = base table ANTI JOIN deletes (the delete set is almost
             always broadcast-sized; Spark picks BroadcastHashJoin)
  vacuum   = rewrite base minus deletes, clear the sidecar (compaction)

This is the same merge-on-read design Delta/Iceberg deletion vectors
use, on plain parquet.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DELETES = "_deletes"
_VECTORS = "vectors"


def _deletes_dir(table_path: str) -> str:
    return os.path.join(table_path, _DELETES)


def append_deletes(spark: SparkSession, table_path: str, ids: list) -> int:
    """Record soft deletions without touching the base table."""
    if not ids:
        return 0
    df = spark.createDataFrame([(str(i),) for i in ids], "id string")
    # one tiny file per delete batch; compaction clears them
    df.coalesce(1).write.mode("append").parquet(_deletes_dir(table_path))
    return len(ids)


def read_deletes(spark: SparkSession, table_path: str) -> DataFrame | None:
    d = _deletes_dir(table_path)
    if not os.path.isdir(d) or not any(
        f.endswith(".parquet") for f in os.listdir(d)
    ):
        return None
    return spark.read.parquet(d).select("id").distinct()


def read_live(
    spark: SparkSession, table_path: str, id_col: str = "id"
) -> DataFrame:
    """Base table minus the delete set (broadcast anti-join)."""
    base = spark.read.parquet(os.path.join(table_path, _VECTORS))
    dels = read_deletes(spark, table_path)
    if dels is None:
        return base
    return base.join(
        F.broadcast(dels.withColumnRenamed("id", id_col)), id_col, "left_anti"
    )


def vacuum(spark: SparkSession, table_path: str, id_col: str = "id") -> dict:
    """Compaction: physically drop deleted rows, clear the sidecar
    (hybrid/core.rs:989-1011 semantics; returns removal counts).

    Writes to a temp dir then swaps, so a crash mid-vacuum leaves the old
    table + sidecar intact (re-runnable)."""
    vec_dir = os.path.join(table_path, _VECTORS)
    before = spark.read.parquet(vec_dir).count()
    live = read_live(spark, table_path, id_col=id_col)
    tmp = os.path.join(table_path, f"_vacuum-{uuid.uuid4().hex[:8]}")
    live.write.mode("overwrite").parquet(tmp)
    after = spark.read.parquet(tmp).count()
    shutil.rmtree(vec_dir)
    os.rename(tmp, vec_dir)
    d = _deletes_dir(table_path)
    if os.path.isdir(d):
        shutil.rmtree(d)
    return {"removed": before - after, "remaining": after}
