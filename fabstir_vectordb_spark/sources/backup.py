"""Backup / restore / verification for saved sessions (SURVEY §2.7).

Parity target: src/hybrid/maintenance.rs:653-799 (backup = copy tree,
incremental = vectors newer than `since`, verification stub) — the
reference largely simulates these; here they are real filesystem +
DataFrame operations over the session save layout
(manifest.json, schema.json?, ivf_index.json?, vectors/).

At real scale `shutil` becomes `hadoop distcp`/object-store copy — the
logic (what to copy, how to verify) is the engine's; the byte transport
is the filesystem's.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def backup(table_path: str, backup_path: str) -> dict:
    """Full backup: copy the session tree (maintenance.rs:672-700)."""
    if os.path.exists(backup_path):
        raise ValueError(f"backup target exists: {backup_path}")
    shutil.copytree(table_path, backup_path)
    return {
        "files": sum(len(fs) for _, _, fs in os.walk(backup_path)),
        "backup_path": backup_path,
    }


def incremental_backup(
    spark: SparkSession,
    table_path: str,
    backup_path: str,
    since: _dt.datetime,
) -> dict:
    """Copy only vectors newer than `since` (maintenance.rs:702-738).

    The increment is a self-contained parquet of the delta rows plus a
    small manifest recording the cut; applying increments = union by ts.
    """
    df = spark.read.parquet(os.path.join(table_path, "vectors"))
    delta = df.filter(F.col("ts") > F.lit(since))
    n = delta.count()
    os.makedirs(backup_path, exist_ok=True)
    delta.write.mode("overwrite").parquet(os.path.join(backup_path, "vectors"))
    with open(os.path.join(backup_path, "increment.json"), "w") as f:
        json.dump({"since": since.isoformat(), "rows": n}, f)
    return {"rows": n, "backup_path": backup_path}


def restore(backup_path: str, table_path: str, overwrite: bool = False) -> dict:
    """Restore a full backup (maintenance.rs:740-770)."""
    if os.path.exists(table_path):
        if not overwrite:
            raise ValueError(f"restore target exists: {table_path}")
        shutil.rmtree(table_path)
    shutil.copytree(backup_path, table_path)
    return {"restored_to": table_path}


def verify_backup(spark: SparkSession, table_path: str, backup_path: str) -> dict:
    """Row-count + manifest equality between source and backup — the
    check the reference stubs out (maintenance.rs:772-799)."""
    a = spark.read.parquet(os.path.join(table_path, "vectors")).count()
    b = spark.read.parquet(os.path.join(backup_path, "vectors")).count()
    ma = mb = None
    for p, slot in ((table_path, "a"), (backup_path, "b")):
        mf = os.path.join(p, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as f:
                m = json.load(f)
            if slot == "a":
                ma = m
            else:
                mb = m
    return {"ok": a == b and ma == mb, "source_rows": a, "backup_rows": b}
