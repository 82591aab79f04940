"""REST facade (SURVEY §3.2) — a thin HTTP layer over VectorDbSession.

Parity target: the axum server (src/api/rest.rs, router :325-352):

  GET    /health                     :355-361
  POST   /api/v1/vectors             insert one        :392-447
  POST   /api/v1/vectors/batch       insert many, per-row errors :449-531
  GET    /api/v1/vectors/{id}        point lookup      :533-570
  DELETE /api/v1/vectors/{id}        soft delete       :573-597
  POST   /api/v1/search              similarity search :600-676
  GET    /api/v1/statistics          stats             :679-690

Deviations (improvements, documented): the reference's search handler
*ignores* the filter and search options it parses (rest.rs:631-634) and
fetches metadata with one storage call per result (:640-648); here the
filter/options are honored and metadata is joined in-plan.  Response
shapes match SearchResponse {results, search_time_ms, indices_searched,
partial_results} (:94-113,671-676).

stdlib http.server only — the facade is deliberately dependency-free;
it exists to demonstrate API parity, not to be a production server.
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from fabstir_vectordb_spark.session import VectorDbError, VectorDbSession

_VEC_ID_RE = re.compile(r"^/api/v1/vectors/([^/]+)$")


def make_handler(session: VectorDbSession):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        # ------------------------------------------------------------ util

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict | None:
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > 10 * 1024 * 1024:  # 10MB body limit (rest.rs:343)
                    self._json(413, {"error": "body too large"})
                    return None
                return json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._json(400, {"error": "invalid JSON"})
                return None

        # ---------------------------------------------------------- routes

        def do_GET(self):
            if self.path == "/health":
                return self._json(200, {"status": "ok"})
            if self.path == "/api/v1/statistics":
                # StatisticsResponse {total_vectors, recent_vectors,
                # historical_vectors, memory_usage{total_bytes, hnsw_bytes,
                # ivf_bytes}} (rest.rs:679-693 — a TODO returning zeros in
                # the reference; here populated via session.memory_usage).
                s = session.get_stats()
                m = session.memory_usage()
                return self._json(
                    200,
                    {
                        "total_vectors": s["vectorCount"],
                        "recent_vectors": s["recentCount"],
                        "historical_vectors": s["historicalCount"],
                        "memory_usage": {
                            "total_bytes": m["total_bytes"],
                            "hnsw_bytes": m["hnsw_bytes"],
                            "ivf_bytes": m["ivf_bytes"],
                        },
                    },
                )
            if self.path == "/api/v1/statistics/session":
                # the session-level stats shape (session.rs:699-721)
                return self._json(200, session.get_stats())
            if self.path.split("?")[0] == "/api/v1/events":
                # the reference documents an SSE update stream
                # (docs/API.md:715-726) whose server side is a stub;
                # here the mutation log is real and served as a
                # cursor-polling endpoint: ?since=<seq> returns events
                # with seq >= since plus the next cursor — the stateless
                # HTTP analogue of resuming an SSE stream
                from urllib.parse import parse_qs, urlsplit

                qs = parse_qs(urlsplit(self.path).query)
                try:
                    since = int(qs.get("since", ["0"])[0])
                except ValueError:
                    return self._json(400, {"error": "since must be an integer"})
                rows = [e for e in session._events if e[0] >= since]
                return self._json(
                    200,
                    {
                        "events": [
                            {
                                "seq": seq,
                                "type": etype,
                                "vector_id": vid,
                                "timestamp": ts.isoformat(),
                            }
                            for seq, etype, vid, ts in rows
                        ],
                        "next_since": (rows[-1][0] + 1) if rows else since,
                    },
                )
            m = _VEC_ID_RE.match(self.path)
            if m:
                v = session.get_vector(m.group(1))
                if v is None:
                    return self._json(404, {"error": "not found"})
                return self._json(200, v)
            self._json(404, {"error": "unknown route"})

        def do_DELETE(self):
            m = _VEC_ID_RE.match(self.path)
            if not m:
                return self._json(404, {"error": "unknown route"})
            try:
                session.delete_vector(m.group(1))
                return self._json(200, {"deleted": m.group(1)})
            except VectorDbError as e:
                return self._json(404, {"error": str(e)})

        def do_POST(self):
            body = self._body()
            if body is None:
                return
            if self.path == "/api/v1/vectors":
                try:
                    import datetime as _dt

                    session.add_vectors([body])
                    # InsertVectorResponse {id, index, timestamp}
                    # (rest.rs:440-447); "recent" because fresh inserts
                    # land on the recent side of the ts routing predicate
                    return self._json(
                        201,
                        {
                            "id": str(body.get("id")),
                            "index": "recent",
                            "timestamp": _dt.datetime.now(_dt.timezone.utc)
                            .isoformat()
                            .replace("+00:00", "Z"),
                        },
                    )
                except (VectorDbError, KeyError, TypeError) as e:
                    return self._json(400, {"error": str(e)})
            if self.path == "/api/v1/vectors/batch":
                # single-pass batch insert with the reference's per-row
                # error shape: BatchInsertResponse {successful, failed,
                # errors: [{id, error}]} (rest.rs:449-531, returns 200)
                try:
                    res = session.batch_add_vectors(body.get("vectors", []))
                except Exception as e:  # malformed request body shapes
                    return self._json(400, {"error": str(e)})
                return self._json(200, res)
            if self.path == "/api/v1/search":
                vec = body.get("vector")
                if not vec:
                    # empty vector => 400 (rest.rs:741-746)
                    return self._json(400, {"error": "vector must be non-empty"})
                opts = body.get("options") or {}
                t0 = time.time()
                try:
                    results = session.search(
                        vec,
                        k=body.get("k", 10),
                        threshold=opts.get("threshold", 0.0),
                        filter=body.get("filter"),
                        include_vectors=opts.get("includeVectors", False),
                        search_recent=opts.get("searchRecent", True),
                        search_historical=opts.get("searchHistorical", True),
                    )
                except (VectorDbError, Exception) as e:  # filter errors => 400
                    return self._json(400, {"error": str(e)})
                return self._json(
                    200,
                    {
                        "results": results,
                        "search_time_ms": (time.time() - t0) * 1000.0,
                        "indices_searched": ["vectors"],
                        "partial_results": False,
                    },
                )
            if self.path == "/api/v1/admin/migrate":
                # trigger_migration (rest.rs:337): run one tier-migration
                # batch; body may set max_per_run / age_days
                try:
                    res = session.migrate_aged(
                        max_per_run=int(body.get("max_per_run", 100)),
                        age_days=int(body.get("age_days", 7)),
                    )
                except (VectorDbError, ValueError, TypeError) as e:
                    return self._json(400, {"error": str(e)})
                return self._json(200, res)
            if self.path == "/api/v1/admin/rebalance":
                # rebalance (rest.rs:338): Spark assignment is always
                # nearest-centroid, so imbalance repair = retrain
                # (SURVEY §2 row 41); returns the refreshed cluster stats
                try:
                    n = body.get("n_clusters")
                    session.train_index(
                        n_clusters=int(n) if n else (
                            session._index.n_clusters if session._index else 16
                        )
                    )
                except (VectorDbError, ValueError, TypeError) as e:
                    return self._json(400, {"error": str(e)})
                return self._json(200, {"status": "rebalanced"})
            if self.path == "/api/v1/admin/backup":
                # backup (rest.rs:339): checksummed save to the given dir
                path = body.get("path")
                if not path:
                    return self._json(400, {"error": "path required"})
                try:
                    sid = session.save(path, checksums=True)
                except (VectorDbError, OSError) as e:
                    return self._json(400, {"error": str(e)})
                return self._json(200, {"status": "ok", "session_id": sid})
            self._json(404, {"error": "unknown route"})

    return Handler


class RestServer:
    """Threaded facade server; bind port 0 for an ephemeral port."""

    def __init__(self, session: VectorDbSession, host: str = "127.0.0.1", port: int = 0):
        self._httpd = ThreadingHTTPServer((host, port), make_handler(session))
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "RestServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
