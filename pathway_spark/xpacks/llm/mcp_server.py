"""MCP (Model Context Protocol) server for the RAG surface.

Reference: `python/pathway/xpacks/llm/mcp_server.py:113` (McpConfig),
`:154` (McpServable), `:168` (McpServer), `:308` (PathwayMcp). The
reference wraps FastMCP; that package isn't available here, so this
implements the protocol's HTTP transport directly — MCP is JSON-RPC 2.0
over a streamable-HTTP endpoint with three core methods a tool host
needs: ``initialize``, ``tools/list`` and ``tools/call`` — on the same
stdlib webserver the REST endpoints use. Tools are synchronous handlers
over one-row query frames, like ``BaseRestServer.serve``.
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import functions as F

from ...io.http_server import PathwayWebserver
from ...table import ID, Table

PROTOCOL_VERSION = "2025-03-26"

_SPARK_TO_JSON = {
    "bigint": "integer", "int": "integer", "smallint": "integer",
    "double": "number", "float": "number", "boolean": "boolean",
    "string": "string", "binary": "string",
}


@dataclass
class McpConfig:
    """reference mcp_server.py:113 — name + transport + host/port."""

    name: str = "pathway-mcp-server"
    transport: str = "streamable-http"
    host: str | None = "127.0.0.1"
    port: int | None = 8123
    path: str = "/mcp"

    def __post_init__(self):
        if self.transport not in ("streamable-http",):
            raise ValueError(
                f"transport {self.transport!r} not supported: the Spark "
                "engine serves MCP over streamable-http only (stdio needs "
                "a process-per-session host)"
            )


class McpServable(ABC):
    """reference mcp_server.py:154 — a component that can register its
    tools on an McpServer."""

    @abstractmethod
    def register_mcp(self, server: "McpServer") -> None: ...


@dataclass
class _Tool:
    name: str
    handler: Callable[[Table], Table]
    schema: Any
    description: str = ""


class McpServer:
    """JSON-RPC 2.0 MCP endpoint (reference mcp_server.py:168).

    ``tool(name, request_handler=..., schema=...)`` mirrors the
    reference's registration API; handlers receive a one-row Table of
    the call arguments and return a Table whose first row's ``result``
    column (or full row set) becomes the tool result content."""

    _instances: dict[str, "McpServer"] = {}

    def __init__(self, config: McpConfig, *, spark=None):
        from ...io import _spark

        self.config = config
        self._spark = spark or _spark()
        self._tools: dict[str, _Tool] = {}
        self.webserver = PathwayWebserver(config.host or "127.0.0.1",
                                          int(config.port or 0))
        self.webserver.register_handler(config.path, self._handle, ("POST",))

    @classmethod
    def get(cls, config: McpConfig, *, spark=None) -> "McpServer":
        if config.name not in cls._instances:
            cls._instances[config.name] = cls(config, spark=spark)
        return cls._instances[config.name]

    @property
    def port(self) -> int:
        return self.webserver.port

    # ---------------------------------------------------------------- tools
    def tool(self, name: str, *, request_handler: Callable[[Table], Table],
             schema, description: str = "") -> None:
        self._tools[name] = _Tool(name, request_handler, schema, description)

    def _input_schema(self, schema) -> dict:
        struct = schema.to_struct_type()
        props = {
            f.name: {"type": _SPARK_TO_JSON.get(f.dataType.simpleString(),
                                                "string")}
            for f in struct.fields
        }
        # only default-less columns are required — handlers fall back to
        # defaults via args.get, so strict MCP clients may omit the rest
        defs = getattr(schema, "_columns", {})
        required = [f.name for f in struct.fields
                    if getattr(defs.get(f.name), "default_value", None) is None]
        return {"type": "object", "properties": props, "required": required}

    # ------------------------------------------------------------- protocol
    def _handle(self, method: str, payload: dict):
        rid = payload.get("id")
        rpc = payload.get("method")

        def ok(result):
            return 200, {"jsonrpc": "2.0", "id": rid, "result": result}

        def err(code, msg):
            return 200, {"jsonrpc": "2.0", "id": rid,
                         "error": {"code": code, "message": msg}}

        if rpc == "initialize":
            return ok({
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {"listChanged": False}},
                "serverInfo": {"name": self.config.name,
                               "version": "pathway-spark"},
            })
        if rpc == "notifications/initialized":
            return 200, None
        if rpc == "tools/list":
            return ok({"tools": [
                {"name": t.name, "description": t.description,
                 "inputSchema": self._input_schema(t.schema)}
                for t in self._tools.values()
            ]})
        if rpc == "tools/call":
            params = payload.get("params") or {}
            tool = self._tools.get(params.get("name"))
            if tool is None:
                return err(-32601, f"unknown tool {params.get('name')!r}")
            args = params.get("arguments") or {}
            try:
                struct = tool.schema.to_struct_type()
                if struct.fields:
                    row = {f.name: args.get(f.name) for f in struct.fields}
                    qdf = self._spark.createDataFrame([row], struct)
                else:
                    qdf = self._spark.range(1).drop("id")
                qdf = qdf.withColumn(ID, F.lit(0).cast("long"))
                out = tool.handler(Table(qdf))
                odf = out._df if isinstance(out, Table) else out
                rows = odf.collect()
                cols = [c for c in odf.columns if c != ID]
                if len(rows) == 1 and "result" in cols:
                    text = rows[0]["result"]
                    text = text if isinstance(text, str) else json.dumps(text)
                else:
                    text = json.dumps([{c: r[c] for c in cols} for r in rows],
                                      default=str)
            except Exception as ex:  # noqa: BLE001 — MCP spec: tool
                # execution failures are a RESULT with isError, not a
                # transport-level HTTP 500 (strict clients reject those)
                return ok({"content": [{"type": "text",
                                        "text": f"{type(ex).__name__}: {ex}"}],
                           "isError": True})
            return ok({"content": [{"type": "text", "text": text}],
                       "isError": False})
        return err(-32601, f"unknown method {rpc!r}")

    def run(self, threaded: bool = True):
        self.webserver.start()


@dataclass
class PathwayMcp:
    """reference mcp_server.py:308 — declarative config: build the
    server and register every servable's tools."""

    name: str = "pathway-mcp-server"
    transport: str = "streamable-http"
    host: str | None = "127.0.0.1"
    port: int | None = 8123
    serve: list = field(default_factory=list)
    spark: Any = None

    def __post_init__(self):
        cfg = McpConfig(name=self.name, transport=self.transport,
                        host=self.host, port=self.port)
        self.server = McpServer.get(cfg, spark=self.spark)
        for servable in self.serve:
            servable.register_mcp(self.server)


__all__ = ["McpConfig", "McpServable", "McpServer", "PathwayMcp",
           "PROTOCOL_VERSION"]
