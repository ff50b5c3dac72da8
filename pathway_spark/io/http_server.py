"""Inbound HTTP serving: webserver source + REST request/response bridge.

Reference parity: `python/pathway/io/http/_server.py:496` (PathwayWebserver),
`:723` (rest_connector). The reference runs an aiohttp server whose requests
become rows of a live table and whose responses are fulfilled by a sink over
the result table. The Spark-native mapping:

- ``PathwayWebserver`` — stdlib ``ThreadingHTTPServer`` on a daemon thread
  with a route registry. Two handler kinds:
  (a) synchronous JSON handlers (``register_handler``) for request/response
      services computed eagerly (DocumentStoreServer, QARestServer), and
  (b) streaming endpoints created by ``rest_connector``.
- ``rest_connector`` — each request is assigned a deterministic id, parsed
  against the schema, spooled as a JSON-lines file, and blocked on a
  per-request future. The returned Table is a Structured Streaming
  ``readStream.json`` over the spool directory (a real unbounded source —
  at scale the same spool is an object-store prefix or Kafka topic), and
  ``response_writer(result_table)`` attaches a ``foreachBatch`` sink that
  completes the pending futures by id, unblocking the HTTP responses.

Everything is stdlib + Spark; offline-testable on an ephemeral port.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import uuid
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import functions as F

from ..table import ID, Table


@dataclass
class EndpointDocumentation:
    """OpenAPI doc stub (reference _server.py EndpointDocumentation)."""

    summary: str | None = None
    description: str | None = None
    tags: Sequence[str] = ()
    method_types: Sequence[str] | None = None


@dataclass
class EndpointExamples:
    examples: list = field(default_factory=list)


@dataclass
class _Route:
    methods: tuple[str, ...]
    handler: Callable  # (method, payload: dict) -> (status, result)


class RawResponse:
    """Non-JSON handler result: serve `body` verbatim with the given
    content type (HTML dashboards, plaintext scrape formats...)."""

    def __init__(self, body, content_type: str = "text/html; charset=utf-8"):
        self.body = body.encode() if isinstance(body, str) else body
        self.content_type = content_type


class PathwayWebserver:
    """Host/port config + route registry + lazily-started HTTP server.

    One instance per host-port pair, shared by any number of
    ``rest_connector`` endpoints and synchronous handlers (reference
    `_server.py:496`)."""

    def __init__(self, host: str, port: int, with_schema_endpoint: bool = True,
                 with_cors: bool = False):
        self.host = host
        self.port = int(port)
        self._routes: dict[str, _Route] = {}
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._with_schema = with_schema_endpoint
        self._with_cors = with_cors
        self._schemas: dict[str, dict] = {}

    # -------------------------------------------------------------- routes
    def register_handler(self, route: str, handler: Callable,
                         methods: Sequence[str] = ("POST",),
                         schema_doc: dict | None = None) -> None:
        """Synchronous endpoint: ``handler(method, payload_dict)`` returns
        a JSON-serializable result (or raises)."""
        self._routes[route.rstrip("/") or "/"] = _Route(
            tuple(m.upper() for m in methods), handler
        )
        if schema_doc:
            self._schemas[route] = schema_doc
        self.start()

    # -------------------------------------------------------------- server
    def start(self) -> None:
        with self._lock:
            if self._server is not None:
                return
            ws = self

            class Handler(BaseHTTPRequestHandler):
                def log_message(self, *a):  # quiet
                    pass

                def _reply(self, status: int, body):
                    if isinstance(body, RawResponse):
                        data = body.body
                        ctype = body.content_type
                    else:
                        data = json.dumps(body).encode()
                        ctype = "application/json"
                    self.send_response(status)
                    self.send_header("Content-Type", ctype)
                    if ws._with_cors:
                        self.send_header("Access-Control-Allow-Origin", "*")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)

                def _dispatch(self, method: str):
                    parsed = urlparse(self.path)
                    path = parsed.path.rstrip("/") or "/"
                    if ws._with_schema and path == "/_schema":
                        return self._reply(200, ws._schemas)
                    route = ws._routes.get(path)
                    if route is None:
                        return self._reply(404, {"error": "no such endpoint"})
                    if method not in route.methods:
                        return self._reply(405, {"error": "method not allowed"})
                    if method in ("POST", "PUT", "PATCH"):
                        ln = int(self.headers.get("Content-Length") or 0)
                        raw = self.rfile.read(ln) if ln else b"{}"
                        try:
                            payload = json.loads(raw or b"{}")
                        except json.JSONDecodeError:
                            return self._reply(400, {"error": "invalid json"})
                    else:
                        payload = {
                            k: v[0] for k, v in parse_qs(parsed.query).items()
                        }
                    try:
                        status, result = route.handler(method, payload)
                    except Exception as ex:  # noqa: BLE001 — serve the error
                        return self._reply(500, {"error": str(ex)})
                    return self._reply(status, result)

                def do_GET(self):
                    self._dispatch("GET")

                def do_POST(self):
                    self._dispatch("POST")

                def do_PUT(self):
                    self._dispatch("PUT")

                def do_DELETE(self):
                    self._dispatch("DELETE")

            self._server = ThreadingHTTPServer((self.host, self.port), Handler)
            self.port = self._server.server_address[1]  # resolve port 0
            self._thread = threading.Thread(
                target=self._server.serve_forever, daemon=True
            )
            self._thread.start()

    def stop(self) -> None:
        with self._lock:
            if self._server is not None:
                self._server.shutdown()
                self._server.server_close()
                self._server = None


class _PendingRequests:
    """id -> threading.Event + result slot, shared between the HTTP
    handler (waits) and the foreachBatch sink (fulfills)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._events: dict[int, threading.Event] = {}
        self._results: dict[int, object] = {}

    def create(self, rid: int) -> threading.Event:
        ev = threading.Event()
        with self._lock:
            self._events[rid] = ev
        return ev

    def fulfill(self, rid: int, result) -> None:
        with self._lock:
            ev = self._events.pop(rid, None)
            if ev is not None:
                self._results[rid] = result
                ev.set()

    def take(self, rid: int):
        with self._lock:
            return self._results.pop(rid, None)

    def discard(self, rid: int) -> None:
        """Drop all state for a timed-out request — without this, a
        fulfill() that lands after the 504 would park its result in
        ``_results`` forever (unbounded growth under a slow pipeline)."""
        with self._lock:
            self._events.pop(rid, None)
            self._results.pop(rid, None)


def rest_connector(
    host: str | None = None,
    port: int | str | None = None,
    *,
    webserver: PathwayWebserver | None = None,
    route: str = "/",
    schema=None,
    methods: Sequence[str] = ("POST",),
    autocommit_duration_ms: int = 1500,
    documentation: EndpointDocumentation | None = None,
    delete_completed_queries: bool | None = None,
    request_validator: Callable | None = None,
    spark=None,
    spool_dir: str | None = None,
    response_timeout_s: float = 30.0,
) -> tuple[Table, Callable]:
    """Inbound REST source (reference `io/http/_server.py:723`).

    Returns ``(table, response_writer)``: a STREAMING table of requests
    (schema columns + ``_pw_id``) and a callable that takes the result
    table (must carry ``_pw_id`` and a ``result`` column), starts the
    response sink, and unblocks waiting HTTP clients.

    Divergence note (documented, SURVEY §4): responses are fulfilled at
    micro-batch boundaries (~trigger interval latency) rather than per
    dataflow epoch; ``delete_completed_queries`` is a no-op because the
    snapshot never retracts served rows.
    """
    from . import _spark  # lazy: session factory lives in io/__init__

    if webserver is None:
        webserver = PathwayWebserver(host or "127.0.0.1", int(port or 0))
    spark = spark or _spark()
    if schema is None:
        raise ValueError("rest_connector requires a schema")
    struct = schema.to_struct_type()
    spool = spool_dir or tempfile.mkdtemp(prefix="pw_rest_")
    pending = _PendingRequests()
    validator = request_validator

    def handler(method: str, payload: dict):
        if validator is not None:
            try:
                verdict = validator(payload)
            except Exception as ex:  # noqa: BLE001
                return 400, {"error": str(ex)}
            if verdict is not None:
                return 400, {"error": str(verdict)}
        rid = uuid.uuid4().int & ((1 << 63) - 1)
        row = {f.name: payload.get(f.name) for f in struct.fields}
        row[ID] = rid
        ev = pending.create(rid)
        path = os.path.join(spool, f"{rid}.json")
        with open(path + ".tmp", "w") as f:
            json.dump(row, f)
        os.rename(path + ".tmp", path)  # atomic: readStream never sees partials
        if not ev.wait(timeout=response_timeout_s):
            pending.discard(rid)
            return 504, {"error": "response timeout"}
        return 200, pending.take(rid)

    webserver.register_handler(
        route, handler, methods,
        schema_doc={f.name: f.dataType.simpleString() for f in struct.fields},
    )

    full = struct.add(ID, "long")
    df = spark.readStream.schema(full).option("maxFilesPerTrigger", 64).json(spool)
    table = Table(df)

    def response_writer(result_table: Table, *, result_col: str = "result"):
        rdf = result_table._df if isinstance(result_table, Table) else result_table

        def batch_fn(bdf, batch_id):
            for r in bdf.select(ID, result_col).collect():
                pending.fulfill(r[ID], {result_col: r[result_col]})

        trigger_s = max(autocommit_duration_ms, 100) / 1000.0
        q = (rdf.writeStream.outputMode("append")
             .trigger(processingTime=f"{trigger_s} seconds")
             .foreachBatch(batch_fn).start())
        response_writer.query = q
        return q

    response_writer.webserver = webserver
    response_writer.spool_dir = spool
    return table, response_writer
