"""Stateful streaming top-k: state carries across micro-batches."""

import json

from pyspark.sql import functions as F

from fabstir_vectordb_spark.streaming.topk import streaming_topk

SCHEMA = "query_id string, id string, distance double"


def _write_batch(path, rows, name):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / name, "w") as f:
        for q, i, d in rows:
            f.write(json.dumps({"query_id": q, "id": i, "distance": d}) + "\n")


def test_streaming_topk_accumulates(spark, tmp_path):
    src = tmp_path / "in"
    # batch 1: three candidates for q0
    _write_batch(src, [("q0", "a", 5.0), ("q0", "b", 1.0), ("q0", "c", 3.0)], "b1.json")

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    out = streaming_topk(stream, k=2)
    q = (
        out.writeStream.format("memory")
        .queryName("stk")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    first = {(r["id"], r["rank"]) for r in spark.sql("select * from stk").collect()}
    assert first == {("b", 1), ("c", 2)}  # top-2 of batch 1

    # batch 2: a better candidate arrives + duplicate id with worse distance
    _write_batch(src, [("q0", "d", 0.5), ("q0", "b", 9.0)], "b2.json")
    q2 = (
        streaming_topk(
            spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src)),
            k=2,
        )
        .writeStream.format("memory")
        .queryName("stk2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    # the LAST update for q0 must be the merged ranking: d then b(min dist 1.0)
    rows = spark.sql("select * from stk2").collect()
    final = {(r["id"], r["rank"], r["distance"]) for r in rows[-2:]}
    assert final == {("d", 1, 0.5), ("b", 2, 1.0)}
