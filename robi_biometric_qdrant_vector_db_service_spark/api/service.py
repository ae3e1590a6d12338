"""S8: the reference's HTTP API surface over the Spark engine.

Routes, request bodies, and response shapes mirror the reference
(src/api/endpoints.py:32-312, src/api/schemas.py:8-122) so a client of the
reference service can point at this facade unchanged:

  POST   /api/v1/vectors/add          {embedding, user_id, metadata?, point_id?}
  POST   /api/v1/vectors/add_batch    {embeddings, user_ids, metadata_list?, point_ids?}
  POST   /api/v1/vectors/search       {embedding, k?, threshold?, user_filter?}
  DELETE /api/v1/vectors/{point_id}
  DELETE /api/v1/vectors/user/{user_id}
  GET    /api/v1/stats | /api/v1/health | /api/v1/info

Implementation: stdlib ``http.server`` (no web framework in this image —
and none needed: the handler is a thin JSON shim; every data operation is
the engine's own DataFrame plan).  The driver process hosts the HTTP
thread pool the way the reference's uvicorn loop hosts its async handlers;
at scale this facade runs on the Spark driver (or a thrift/Connect
gateway) while the heavy lifting stays on the executors.  Store mutations
serialize on a lock — the manifest swap is read-modify-write, which the
reference serializes on its single event loop (main.py) the same way.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

PREFIX = "/api/v1"


class VectorService:
    """Engine-backed implementation of the reference's service endpoints.

    Wraps a ``VectorStore`` (operators/store.py); every handler body is the
    corresponding engine operation — the HTTP layer adds only JSON
    (de)serialization, uuid defaults, and latency accounting
    (the reference's performance_stats, utils/performance.py)."""

    def __init__(self, spark: SparkSession, store_root: str):
        from ..operators.store import VectorStore

        self.spark = spark
        self.store = VectorStore.create(spark, store_root)
        self._write_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._op_stats: dict[str, list] = {}  # op -> [count, total_ms]
        self._started = time.time()

    # -- engine calls -------------------------------------------------------

    def _record(self, op: str, t0: float) -> float:
        ms = (time.perf_counter() - t0) * 1000.0
        with self._stats_lock:  # handlers run on the HTTP thread pool
            c = self._op_stats.setdefault(op, [0, 0.0])
            c[0] += 1
            c[1] += ms
        return ms

    def _rows_df(self, rows: list[dict]):
        data = [
            (
                r.get("point_id") or str(uuid.uuid4()),
                [float(x) for x in r["embedding"]],
                str(r["user_id"]),
                {str(k): str(v) for k, v in (r.get("metadata") or {}).items()},
            )
            for r in rows
        ]
        df = self.spark.createDataFrame(
            data,
            schema="point_id string, embedding array<double>, user_id string, "
            "metadata map<string,string>",
        )
        return df, [d[0] for d in data]

    def add(self, body: dict) -> dict:
        t0 = time.perf_counter()
        df, ids = self._rows_df([body])
        with self._write_lock:
            self.store.add_batch(df)
        self._record("add", t0)
        return {
            "success": True,
            "point_id": ids[0],
            "message": "Vector added successfully",
            "timestamp": time.time(),
        }

    def add_batch(self, body: dict) -> dict:
        t0 = time.perf_counter()
        embs = body["embeddings"]
        users = body["user_ids"]
        if len(embs) != len(users):
            raise ValueError("embeddings and user_ids must be the same length")
        metas = body.get("metadata_list") or [None] * len(embs)
        pids = body.get("point_ids") or [None] * len(embs)
        rows = [
            {"embedding": e, "user_id": u, "metadata": m, "point_id": p}
            for e, u, m, p in zip(embs, users, metas, pids)
        ]
        df, ids = self._rows_df(rows)
        with self._write_lock:
            n = self.store.add_batch(df)
        self._record("add_batch", t0)
        return {
            "success": True,
            "point_ids": ids,
            "added_count": n,
            "message": f"Added {n} vectors",
            "timestamp": time.time(),
        }

    def search(self, body: dict) -> dict:
        t0 = time.perf_counter()
        k = int(body.get("k", 10))
        probe = self.spark.createDataFrame(
            [(0, [float(x) for x in body["embedding"]])],
            schema="q_id bigint, q_emb array<double>",
        )
        hits = self.store.search(
            probe,
            k,
            score_threshold=body.get("threshold"),
            user_filter=body.get("user_filter"),
        )
        # enrich hits with payload columns, as the reference's results carry
        # (id, score, user_id, metadata, timestamp)
        corpus = self.store.read(user_id=body.get("user_filter"))
        rows = (
            hits.join(corpus.select("point_id", "user_id", "metadata", "ts"), "point_id")
            .orderBy("rank")
            .collect()
        )
        ms = self._record("search", t0)
        return {
            "success": True,
            "results": [
                {
                    "id": r["point_id"],
                    "score": r["score"],
                    "user_id": r["user_id"],
                    "metadata": dict(r["metadata"] or {}),
                    "timestamp": r["ts"],
                }
                for r in rows
            ],
            "query_time_ms": round(ms, 3),
            "total_results": len(rows),
            "message": f"Found {len(rows)} similar vectors",
            "timestamp": time.time(),
        }

    def delete_point(self, point_id: str) -> dict:
        t0 = time.perf_counter()
        with self._write_lock:
            n = self.store.delete_by_id([point_id])
        self._record("delete", t0)
        return {
            "success": True,
            "deleted": n > 0,
            "message": f"Deleted {n} vector(s)",
            "timestamp": time.time(),
        }

    def delete_user(self, user_id: str) -> dict:
        t0 = time.perf_counter()
        with self._write_lock:
            n = self.store.delete_user(user_id)
        self._record("delete_user", t0)
        return {
            "success": True,
            "deleted_count": n,
            "message": f"Deleted {n} vector(s) for user {user_id}",
            "timestamp": time.time(),
        }

    def _perf_stats(self) -> dict:
        with self._stats_lock:
            return {
                op: {"count": c, "avg_ms": round(tot / c, 3)}
                for op, (c, tot) in self._op_stats.items()
            }

    def stats(self) -> dict:
        return {
            "success": True,
            "collection_info": self.store.stats(),
            "performance_stats": self._perf_stats(),
            "gpu_info": {"gpu_available": False, "engine": "spark"},
            "timestamp": time.time(),
        }

    def health(self) -> dict:
        # keys mirror HealthCheckResponse (schemas.py:118-122); the
        # "connection" here is the store manifest being readable
        ok = self.store._current_version() >= 0
        return {
            "success": True,
            "status": "healthy" if ok else "unhealthy",
            "qdrant_connection": ok,
            "collection_exists": ok,
            "timestamp": time.time(),
        }

    def info(self) -> dict:
        return {
            "service": "robi_biometric_qdrant_vector_db_service_spark",
            "engine": "pyspark",
            "api_version": "v1",
            "uptime_sec": round(time.time() - self._started, 1),
            "store_version": self.store._current_version(),
        }

    # -- http ---------------------------------------------------------------

    def make_server(self, port: int = 0) -> ThreadingHTTPServer:
        """Bind (port 0 = ephemeral) and return the server; call
        ``serve_forever`` (or ``start_background``) to accept requests."""
        service = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet: tests/CI
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            def _route(self, method: str) -> None:
                path = self.path.rstrip("/")
                try:
                    if method == "POST" and path == f"{PREFIX}/vectors/add":
                        return self._send(200, service.add(self._body()))
                    if method == "POST" and path == f"{PREFIX}/vectors/add_batch":
                        return self._send(200, service.add_batch(self._body()))
                    if method == "POST" and path == f"{PREFIX}/vectors/search":
                        return self._send(200, service.search(self._body()))
                    if method == "DELETE" and path.startswith(
                        f"{PREFIX}/vectors/user/"
                    ):
                        uid = path.removeprefix(f"{PREFIX}/vectors/user/")
                        return self._send(200, service.delete_user(uid))
                    if method == "DELETE" and path.startswith(f"{PREFIX}/vectors/"):
                        pid = path.removeprefix(f"{PREFIX}/vectors/")
                        return self._send(200, service.delete_point(pid))
                    if method == "GET" and path == f"{PREFIX}/stats":
                        return self._send(200, service.stats())
                    if method == "GET" and path == f"{PREFIX}/health":
                        return self._send(200, service.health())
                    if method == "GET" and path == f"{PREFIX}/info":
                        return self._send(200, service.info())
                    return self._send(404, {"success": False, "message": "not found"})
                except (KeyError, ValueError, TypeError) as e:
                    return self._send(422, {"success": False, "message": str(e)})
                except Exception as e:  # mirror endpoints.py HTTP 500 wrap
                    return self._send(500, {"success": False, "message": str(e)})

            def do_POST(self):
                self._route("POST")

            def do_GET(self):
                self._route("GET")

            def do_DELETE(self):
                self._route("DELETE")

        return ThreadingHTTPServer(("127.0.0.1", port), Handler)

    def start_background(self, port: int = 0) -> tuple[ThreadingHTTPServer, int]:
        """Start serving on a daemon thread; returns (server, bound_port)."""
        srv = self.make_server(port)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return srv, srv.server_address[1]
