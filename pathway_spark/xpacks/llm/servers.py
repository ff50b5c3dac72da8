"""REST servers for the RAG surface.

Reference: `python/pathway/xpacks/llm/servers.py:16` (BaseRestServer),
`:92` (DocumentStoreServer), `:140` (QARestServer), `:207`
(QASummaryRestServer). The reference wires each endpoint through
``rest_connector`` into one long-running dataflow; in the Spark-native
engine the stores/answerers are eager, so each endpoint is a synchronous
handler that builds a one-row query frame, runs the store's own
retrieval/answer plan, and returns the collected result — per-request
Spark jobs instead of shared dataflow epochs (documented divergence,
SURVEY §4). The streaming ``rest_connector`` bridge remains available
via ``serve_streaming`` for endpoints that want micro-batch semantics.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import functions as F

from ...io.http_server import PathwayWebserver
from ...table import ID, Table


class BaseRestServer:
    """Webserver + endpoint registry (reference servers.py:16)."""

    def __init__(self, host: str, port: int, *, spark=None, **rest_kwargs):
        self.webserver = PathwayWebserver(host=host, port=port)
        from ...io import _spark

        self._spark = spark or _spark()
        self._threads: list[threading.Thread] = []

    @property
    def port(self) -> int:
        """Resolved port (useful with port=0 in tests)."""
        return self.webserver.port

    def serve(self, route: str, schema, handler: Callable[[Table], Table],
              *, methods=("GET", "POST"), result_col: str = "result",
              **_kw) -> None:
        """Register ``handler`` (queries Table -> result Table with a
        ``result`` column) as a synchronous JSON endpoint."""
        struct = schema.to_struct_type()

        def http_handler(method: str, payload: dict):
            if struct.fields:
                row = {f.name: payload.get(f.name) for f in struct.fields}
                qdf = self._spark.createDataFrame([row], struct)
            else:  # parameterless endpoint (statistics/inputs)
                qdf = self._spark.range(1).drop("id")
            qdf = qdf.withColumn(ID, F.lit(0).cast("long"))
            out = handler(Table(qdf))
            odf = out._df if isinstance(out, Table) else out
            rows = odf.collect()
            if not rows:
                return 200, None
            if len(rows) == 1 and result_col in odf.columns:
                return 200, rows[0][result_col]
            cols = [c for c in odf.columns if c != ID]
            return 200, [
                {c: r[c] for c in cols} for r in rows
            ]

        self.webserver.register_handler(
            route, http_handler, methods,
            schema_doc={f.name: f.dataType.simpleString() for f in struct.fields},
        )

    def serve_streaming(self, route: str, schema,
                        handler: Callable[[Table], Table], **rest_kwargs):
        """The reference-shaped micro-batch path: rest_connector source →
        handler over the streaming table → response sink."""
        from ...io.http_server import rest_connector

        queries, writer = rest_connector(
            webserver=self.webserver, route=route, schema=schema,
            spark=self._spark, **rest_kwargs,
        )
        return writer(handler(queries))

    def run(self, threaded: bool = False, with_cache: bool = False,
            cache_backend=None, **_kw):
        """The webserver is already live (daemon threads); ``run`` blocks
        like the reference unless ``threaded``."""
        self.webserver.start()
        if threaded:
            return None
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            self.webserver.stop()


class _SchemaCache:
    """Lazily-built pw schemas for the standard endpoints."""

    _defs = {
        "retrieve": {"query": str, "k": int},
        "statistics": {},
        "inputs": {},
        "answer": {"prompt": str, "k": int},
        "summarize": {"text_list": str},
    }

    @classmethod
    def get(cls, name: str):
        from ...schema import schema_from_types

        return schema_from_types(**cls._defs[name])


class DocumentStoreServer(BaseRestServer):
    """/v1/retrieve, /v1/statistics, /v1/inputs over a DocumentStore
    (reference servers.py:92)."""

    def __init__(self, host: str, port: int, document_store, **rest_kwargs):
        super().__init__(host, port, **rest_kwargs)
        self.store = document_store

        def retrieve(queries: Table) -> Table:
            q = Table(queries._df.withColumn(
                "query_id", F.monotonically_increasing_id()))
            k_rows = queries._df.select("k").collect()
            k = int(k_rows[0]["k"] or 3) if k_rows else 3
            return self.store.retrieve(q, query_col="query", k=k)

        def statistics(_queries: Table) -> Table:
            cdf = self.store.chunks._df
            stats = cdf.agg(
                F.count(F.lit(1)).alias("chunk_count"),
                F.countDistinct(self.store._id_col).alias("doc_count"),
            )
            return Table(stats.withColumn(ID, F.lit(0).cast("long")))

        def inputs(_queries: Table) -> Table:
            docs = self.store.chunks._df.select(
                self.store._id_col).distinct()
            return Table(docs.withColumn(ID, F.col(self.store._id_col)))

        self.serve("/v1/retrieve", _SchemaCache.get("retrieve"), retrieve)
        self.serve("/v1/statistics", _SchemaCache.get("statistics"), statistics)
        self.serve("/v1/inputs", _SchemaCache.get("inputs"), inputs)


class QARestServer(BaseRestServer):
    """/v1/pw_ai_answer + /v2/answer + retrieve/statistics/list_documents
    over a BaseRAGQuestionAnswerer (reference servers.py:140)."""

    def __init__(self, host: str, port: int, rag_question_answerer,
                 **rest_kwargs):
        super().__init__(host, port, **rest_kwargs)
        self.rag = rag_question_answerer

        def answer(queries: Table) -> Table:
            q = Table(queries._df.select(
                F.col("prompt").alias("query"),
                F.lit(0).cast("long").alias(ID),
            ))
            out = self.rag.answer_query(q, query_col="query")
            return Table(out._df.withColumnRenamed("answer", "result"))

        def retrieve(queries: Table) -> Table:
            q = Table(queries._df.withColumn(
                "query_id", F.monotonically_increasing_id()))
            k_rows = queries._df.select("k").collect()
            k = int(k_rows[0]["k"] or 3) if k_rows else 3
            return self.rag._store.retrieve(q, query_col="query", k=k)

        def list_documents(_queries: Table) -> Table:
            docs = self.rag._store.chunks._df.select(
                self.rag._store._id_col).distinct()
            return Table(docs.withColumn(ID, F.col(self.rag._store._id_col)))

        self.serve("/v1/pw_ai_answer", _SchemaCache.get("answer"), answer)
        self.serve("/v2/answer", _SchemaCache.get("answer"), answer)
        self.serve("/v1/retrieve", _SchemaCache.get("retrieve"), retrieve)
        self.serve("/v1/pw_list_documents", _SchemaCache.get("inputs"),
                   list_documents)
        self.serve("/v2/list_documents", _SchemaCache.get("inputs"),
                   list_documents)


class QASummaryRestServer(QARestServer):
    """Adds /v1/pw_ai_summary + /v2/summarize (reference servers.py:207)."""

    def __init__(self, host: str, port: int, rag_question_answerer,
                 **rest_kwargs):
        super().__init__(host, port, rag_question_answerer, **rest_kwargs)

        def summarize(queries: Table) -> Table:
            rows = queries._df.select("text_list").collect()
            texts = [r["text_list"] or "" for r in rows]
            summary = " ".join(t.split(".")[0] for t in texts)[:500]
            sdf = self._spark.createDataFrame(
                [(0, summary)], f"{ID} long, result string"
            )
            return Table(sdf)

        self.serve("/v1/pw_ai_summary", _SchemaCache.get("summarize"), summarize)
        self.serve("/v2/summarize", _SchemaCache.get("summarize"), summarize)


__all__ = [
    "BaseRestServer",
    "DocumentStoreServer",
    "QARestServer",
    "QASummaryRestServer",
]
