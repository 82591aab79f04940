"""Merge-on-read delete sidecar: append / anti-join read / vacuum."""

import os

from pyspark.sql import functions as F

from fabstir_vectordb_spark.sources import deletes as DL


def _table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(f"v{i}", [float(i)]) for i in range(10)], "id string, vector array<float>"
    )
    df.write.parquet(os.path.join(path, "vectors"))
    return path


def test_delete_read_vacuum_cycle(spark, tmp_path):
    path = _table(spark, tmp_path)
    assert DL.read_deletes(spark, path) is None
    assert DL.read_live(spark, path).count() == 10

    assert DL.append_deletes(spark, path, ["v1", "v3"]) == 2
    live = DL.read_live(spark, path)
    assert live.count() == 8
    assert {r["id"] for r in live.collect()} == {f"v{i}" for i in range(10)} - {"v1", "v3"}

    # second batch, overlapping id (idempotent via distinct)
    DL.append_deletes(spark, path, ["v3", "v5"])
    assert DL.read_live(spark, path).count() == 7

    stats = DL.vacuum(spark, path)
    assert stats == {"removed": 3, "remaining": 7}
    # sidecar cleared; base physically compacted
    assert DL.read_deletes(spark, path) is None
    assert spark.read.parquet(os.path.join(path, "vectors")).count() == 7


def test_broadcast_anti_join_plan(spark, tmp_path):
    path = _table(spark, tmp_path)
    DL.append_deletes(spark, path, ["v0"])
    plan = DL.read_live(spark, path)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
