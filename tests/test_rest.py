"""REST facade e2e: stdlib client against the threaded server."""

import json
import urllib.error
import urllib.request

import pytest

from fabstir_vectordb_spark.api.rest import RestServer
from fabstir_vectordb_spark.session import VectorDbSession


@pytest.fixture(scope="module")
def server(spark):
    s = VectorDbSession(spark)
    s.add_vectors(
        [
            {"id": "a", "vector": [0.0, 0.0], "metadata": {"cat": "x"}},
            {"id": "b", "vector": [1.0, 0.0], "metadata": {"cat": "y"}},
            {"id": "c", "vector": [3.0, 4.0], "metadata": {"cat": "x"}},
        ]
    )
    srv = RestServer(s).start()
    yield srv
    srv.stop()


def _req(server, method, path, payload=None):
    url = f"http://127.0.0.1:{server.port}{path}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    code, body = _req(server, "GET", "/health")
    assert code == 200 and body == {"status": "ok"}


def test_search_shape_and_filter(server):
    code, body = _req(server, "POST", "/api/v1/search",
                      {"vector": [0.0, 0.0], "k": 2})
    assert code == 200
    assert {"results", "search_time_ms", "indices_searched", "partial_results"} <= set(body)
    assert [r["id"] for r in body["results"]] == ["a", "b"]
    assert body["results"][0]["score"] == pytest.approx(1.0)

    code, body = _req(server, "POST", "/api/v1/search",
                      {"vector": [0.0, 0.0], "k": 5, "filter": {"cat": "x"}})
    assert [r["id"] for r in body["results"]] == ["a", "c"]

    code, _ = _req(server, "POST", "/api/v1/search", {"vector": []})
    assert code == 400
    code, _ = _req(server, "POST", "/api/v1/search",
                   {"vector": [0.0, 0.0], "filter": {"cat": {"$bogus": 1}}})
    assert code == 400


def test_vector_crud(server):
    code, body = _req(server, "POST", "/api/v1/vectors",
                      {"id": "d", "vector": [9.0, 9.0]})
    assert code == 201
    # InsertVectorResponse shape (rest.rs:440-447)
    assert body["id"] == "d" and body["index"] == "recent"
    assert body["timestamp"].endswith("Z")
    code, body = _req(server, "GET", "/api/v1/vectors/d")
    assert code == 200 and body["vector"] == [9.0, 9.0]
    code, _ = _req(server, "DELETE", "/api/v1/vectors/d")
    assert code == 200
    code, _ = _req(server, "GET", "/api/v1/vectors/d")
    assert code == 404
    code, _ = _req(server, "DELETE", "/api/v1/vectors/never")
    assert code == 404


def test_batch_partial_errors(server):
    # reference shape: BatchInsertResponse {successful, failed,
    # errors: [{id, error}]} (rest.rs:449-531)
    code, body = _req(server, "POST", "/api/v1/vectors/batch", {
        "vectors": [
            {"id": "e", "vector": [1.0, 1.0]},
            {"id": "a", "vector": [2.0, 2.0]},   # duplicate -> per-row error
            {"id": "f", "vector": [1.0]},        # wrong dim -> per-row error
        ]
    })
    assert code == 200
    assert body["successful"] == 1
    assert body["failed"] == 2
    assert {e["id"] for e in body["errors"]} == {"a", "f"}
    assert all(set(e) == {"id", "error"} for e in body["errors"])
    # the valid row actually landed
    code, got = _req(server, "GET", "/api/v1/vectors/e")
    assert code == 200 and got["vector"] == [1.0, 1.0]


def test_statistics(server):
    # StatisticsResponse shape (rest.rs:679-693), populated for real
    code, body = _req(server, "GET", "/api/v1/statistics")
    assert code == 200
    assert set(body) == {
        "total_vectors", "recent_vectors", "historical_vectors", "memory_usage"
    }
    assert body["total_vectors"] >= 3
    assert body["total_vectors"] == body["recent_vectors"] + body["historical_vectors"]
    mu = body["memory_usage"]
    assert set(mu) == {"total_bytes", "hnsw_bytes", "ivf_bytes"}
    assert mu["total_bytes"] == body["total_vectors"] * 2 * 4 + mu["ivf_bytes"]

    code, body = _req(server, "GET", "/api/v1/statistics/session")
    assert code == 200
    assert body["vectorCount"] >= 3 and body["dimension"] == 2


def test_batch_insert_bulk(server):
    code, body = _req(server, "POST", "/api/v1/vectors/batch", {
        "vectors": [
            {"id": f"bulk{i}", "vector": [float(i), 1.0]} for i in range(20)
        ]
    })
    assert code == 200 and body["successful"] == 20 and body["failed"] == 0
    code, _ = _req(server, "GET", "/api/v1/vectors/bulk19")
    assert code == 200


def test_events_endpoint(server):
    """Cursor-polling over the mutation log: the real version of the
    reference's stubbed SSE update stream (docs/API.md:715-726)."""
    code, body = _req(server, "GET", "/api/v1/events")
    assert code == 200
    assert {e["type"] for e in body["events"]} <= {"Inserted", "Updated", "Deleted", "Migrated"}
    n = len(body["events"])
    assert n >= 1 and body["next_since"] == body["events"][-1]["seq"] + 1
    assert [e["seq"] for e in body["events"]] == sorted(e["seq"] for e in body["events"])

    # resume from the cursor: nothing new -> empty page, cursor unchanged
    code, page = _req(server, "GET", f"/api/v1/events?since={body['next_since']}")
    assert code == 200 and page["events"] == [] and page["next_since"] == body["next_since"]

    # a new mutation appears after the cursor
    code, _ = _req(server, "POST", "/api/v1/vectors", {"id": "evt1", "vector": [5.0, 5.0]})
    assert code == 201
    code, page = _req(server, "GET", f"/api/v1/events?since={body['next_since']}")
    assert code == 200
    assert [e["vector_id"] for e in page["events"]] == ["evt1"]
    assert page["events"][0]["type"] == "Inserted"

    code, _ = _req(server, "GET", "/api/v1/events?since=notanint")
    assert code == 400


def test_admin_migrate_rebalance_backup(spark, tmp_path):
    import datetime as dt
    import json as _json
    import urllib.request

    from fabstir_vectordb_spark.api.rest import RestServer
    from fabstir_vectordb_spark.session import VectorDbSession, verify_integrity

    s = VectorDbSession(spark)
    old = dt.datetime(2020, 1, 1)
    s.add_vectors(
        [{"id": f"a{i}", "vector": [float(i), 0.0]} for i in range(4)],
        timestamp=old,
    )
    s.add_vectors([{"id": "new0", "vector": [9.0, 9.0]}])
    srv = RestServer(s)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}/api/v1"

        def post(route, payload):
            req = urllib.request.Request(
                f"{base}{route}",
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                return _json.loads(r.read())

        res = post("/admin/migrate", {"max_per_run": 3})
        assert res == {"migrated": 3, "remaining_aged": 1}
        res = post("/admin/migrate", {})
        assert res["migrated"] == 1 and res["remaining_aged"] == 0

        res = post("/admin/rebalance", {"n_clusters": 2})
        assert res == {"status": "rebalanced"}

        path = str(tmp_path / "rest_backup")
        res = post("/admin/backup", {"path": path})
        assert res["status"] == "ok"
        check = verify_integrity(spark, path)
        assert check["ok"] and check["checksums"]["ok"]
    finally:
        srv.stop()
