"""Session mutation event stream: the reference's update-event
vocabulary (client/rust.rs:72-88 Inserted/Updated/Deleted/Migrated; SSE
endpoint stubbed there) as a real queryable/streamable log."""

import datetime as dt

from pyspark.sql import functions as F

from fabstir_vectordb_spark.session import VectorDbSession

TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _mk(spark):
    s = VectorDbSession(spark, session_id="evt-test")
    s.add_vectors(
        [{"id": f"v{i}", "vector": [float(i), 1.0]} for i in range(4)],
        timestamp=TS,
    )
    return s


def test_event_log_vocabulary_and_order(spark):
    s = _mk(spark)
    s.update_metadata("v1", {"tag": "x"})
    s.delete_vector("v2")
    s.delete_by_metadata({"tag": "x"})
    ev = s.mutation_events().orderBy("seq").collect()
    got = [(r["event_type"], r["vector_id"]) for r in ev]
    assert got == [
        ("Inserted", "v0"),
        ("Inserted", "v1"),
        ("Inserted", "v2"),
        ("Inserted", "v3"),
        ("Updated", "v1"),
        ("Deleted", "v2"),
        ("Deleted", "v1"),
    ]
    # seq is a gapless total order and insert events carry the batch ts
    assert [r["seq"] for r in ev] == list(range(7))
    assert all(r["ts"] == TS.replace(tzinfo=None) for r in ev[:4])


def test_failed_mutations_emit_nothing(spark):
    s = _mk(spark)
    n0 = len(s._events)
    res = s.batch_delete(["nope", "v0"])  # one miss, one hit
    assert res == {
        "successful": 1,
        "failed": 1,
        "errors": ["vector not found: 'nope'"],
    }
    ev = s.mutation_events().orderBy("seq").collect()
    assert [(r["event_type"], r["vector_id"]) for r in ev[n0:]] == [
        ("Deleted", "v0")
    ]
    # a fully-failed batch adds no events
    s.batch_update_metadata([("missing", {"a": 1})])
    assert len(s._events) == n0 + 1


def test_batch_add_emits_only_successful(spark):
    s = _mk(spark)
    n0 = len(s._events)
    s.batch_add_vectors(
        [
            {"id": "v9", "vector": [9.0, 9.0]},
            {"id": "v0", "vector": [1.0, 1.0]},  # duplicate -> rejected
            {"id": "bad", "vector": []},  # empty -> rejected
        ]
    )
    new = s.mutation_events().filter(F.col("seq") >= n0).collect()
    assert [(r["event_type"], r["vector_id"]) for r in new] == [
        ("Inserted", "v9")
    ]


def test_empty_log_and_streaming_analogue(spark, tmp_path):
    s = VectorDbSession(spark, session_id="evt-empty")
    assert s.mutation_events().count() == 0

    # the SSE analogue: persist the log, tail it with Structured Streaming
    s = _mk(spark)
    s.delete_vector("v3")
    out = str(tmp_path / "events")
    s.mutation_events().write.mode("overwrite").parquet(out)
    stream = (
        spark.readStream.schema(
            "seq long, event_type string, vector_id string, ts timestamp"
        )
        .parquet(out)
        .groupBy("event_type")
        .count()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("evt_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {r["event_type"]: r["count"] for r in spark.table("evt_counts").collect()}
    assert got == {"Inserted": 4, "Deleted": 1}
