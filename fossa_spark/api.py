"""Thin HTTP API over the Engine — response-shape parity with the
reference's Flask surface (reference lib/fossa/views/api.py):

- ``POST /api/0.01/task``      → submit a job spec, returns task_id + links
  (reference api.py:28-72; 503 at capacity, 400 on missing model_class,
  412 on unregistered class)
- ``GET  /api/0.01/node_info`` → capacity/running summary (api.py:75-80)
- ``GET  /api/0.01/task/<id>`` → task status document (api.py:83-103)

stdlib http.server on a daemon thread — deliberately no web framework: the
engine is a library; this is an observability/compat shim, not a service
mesh. Spark's own UI/REST covers stage-level observability.
"""

from __future__ import annotations

import html
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from fossa_spark.engine import CapacityExceeded, Engine, InvalidTaskSpec, Job

API_PREFIX = "/api/0.01"


def _make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, doc: dict) -> None:
            body = json.dumps(doc).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args) -> None:  # quiet
            return

        def _send_html(self, code: int, html: str) -> None:
            body = html.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            if self.path == f"{API_PREFIX}/node_info":
                self._send(200, engine.node_summary())
            elif self.path.startswith(f"{API_PREFIX}/task/"):
                task_id = self.path.rsplit("/", 1)[-1]
                doc = engine.task_summary(task_id)
                self._send(200 if doc["status"] != "unknown" else 404, doc)
            elif self.path == "/":
                # HTML node view (reference lib/fossa/views/web.py:11-27)
                s = engine.node_summary()
                rows = "".join(
                    f"<li><a href='/task/{html.escape(t, quote=True)}'>"
                    f"{html.escape(t)}</a></li>"
                    for t in s["running_tasks"] + s["previous_tasks"]
                )
                self._send_html(
                    200,
                    "<html><body><h1>fossa_spark node</h1>"
                    f"<p>capacity: {s['available_processing_capacity']}"
                    f"/{s['max_concurrent_tasks']}</p><ul>{rows}</ul></body></html>",
                )
            elif self.path.startswith("/task/"):
                task_id = self.path.rsplit("/", 1)[-1]
                doc = engine.task_summary(task_id)
                code = 200 if doc["status"] != "unknown" else 404
                # escape everything URL- or job-derived: reflected XSS otherwise
                self._send_html(
                    code,
                    f"<html><body><h1>task {html.escape(task_id)}</h1>"
                    f"<p>status: {html.escape(doc['status'])}</p>"
                    f"<pre>{html.escape(json.dumps(doc, indent=2, default=str))}"
                    "</pre></body></html>",
                )
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self) -> None:
            if self.path != f"{API_PREFIX}/task":
                self._send(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", "0"))
            try:
                doc = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON"})
                return
            if "model_class" not in doc:
                self._send(400, {"error": "model_class is required"})
                return
            job = Job(
                model_class=doc["model_class"],
                method=doc.get("method", "go"),
                method_kwargs=doc.get("method_kwargs", {}),
                model_construction_kwargs=doc.get("model_construction_kwargs", {}),
                resolver_context=doc.get("resolver_context", {}),
                partition_initialise_kwargs=doc.get("partition_initialise_kwargs", {}),
                task_id=doc.get("task_id"),
            )
            try:
                task_id = engine.submit(job)
            except InvalidTaskSpec as e:
                self._send(412, {"error": str(e)})
                return
            except CapacityExceeded as e:
                self._send(503, {"error": str(e)})
                return
            self._send(
                200,
                {
                    "task_id": task_id,
                    "_metadata": {"links": {"task": f"{API_PREFIX}/task/{task_id}"}},
                },
            )

    return Handler


def _make_server(addr, handler, reuse_port: bool = False) -> ThreadingHTTPServer:
    """A ThreadingHTTPServer, optionally joining an SO_REUSEPORT group so
    several acceptor loops can share one port (gunicorn-workers shape
    without leaving the driver process)."""
    if not reuse_port:
        return ThreadingHTTPServer(addr, handler)

    import socket

    if not hasattr(socket, "SO_REUSEPORT"):  # pragma: no cover - non-Linux
        raise OSError("SO_REUSEPORT not supported on this platform")

    class ReuseportServer(ThreadingHTTPServer):
        def server_bind(self) -> None:
            self.socket.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
            super().server_bind()

    return ReuseportServer(addr, handler)


class StatusApi:
    """Serve the engine API on localhost; ``with StatusApi(engine) as api:``
    or ``api.start()`` / ``api.stop()``.

    Serving model (documented trade-off vs the reference): the reference
    fronts its API with gunicorn, workers=4 (reference lib/fossa/main.py:81)
    because each of its requests may fork task processes; here requests
    only read the registry or enqueue to the engine, so the registry must
    stay in THIS process (the Spark driver) — a multi-PROCESS front-end
    would need shared-state plumbing for zero win.  ``workers=N`` gives
    the gunicorn-parity concurrency shape within that constraint: N
    acceptor loops sharing one port via SO_REUSEPORT (the kernel
    load-balances connections across them), each a ThreadingHTTPServer
    spawning a thread per request.  Behind a real deployment, put any
    WSGI front (the handler logic is framework-free) — the engine
    contract does not change."""

    def __init__(self, engine: Engine, port: int = 0, workers: int = 1):
        import socket
        import warnings

        handler = _make_handler(engine)
        # SO_REUSEPORT is Linux-specific (absent on Windows; macOS binds
        # but does not kernel-load-balance) — degrade to a single acceptor
        # rather than crash (round-3 advisor finding).
        if workers > 1 and not hasattr(socket, "SO_REUSEPORT"):
            warnings.warn(
                "SO_REUSEPORT unavailable on this platform; "
                "falling back to workers=1",
                RuntimeWarning,
                stacklevel=2,
            )
            workers = 1
        first = _make_server(("127.0.0.1", port), handler, reuse_port=workers > 1)
        self._servers = [first]
        try:
            for _ in range(workers - 1):
                self._servers.append(
                    _make_server(
                        ("127.0.0.1", first.server_address[1]),
                        handler,
                        reuse_port=True,
                    )
                )
        except OSError:
            # partial construction must not leak bound listeners
            for srv in self._servers:
                srv.server_close()
            raise
        self._threads: list[threading.Thread] = []

    @property
    def port(self) -> int:
        return self._servers[0].server_address[1]

    def start(self) -> "StatusApi":
        for srv in self._servers:
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self) -> None:
        for srv in self._servers:
            srv.shutdown()
            srv.server_close()

    def __enter__(self) -> "StatusApi":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
