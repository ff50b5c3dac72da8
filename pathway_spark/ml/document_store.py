"""DocumentStore — retrieval over split documents (LLM-pipeline surface).

Reference: `python/pathway/xpacks/llm/document_store.py` (DocumentStore
wiring parsers→splitters→index) — re-expressed as a composition of the
engine's own operators: splitters.split_documents → BM25 inverted-index
aggs or embedding KNN. Parsing/embedding UDFs plug in as callables; the
defaults keep everything JVM-side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..table import ID, Table
from .splitters import TokenCountSplitter


class DocumentStore:
    def __init__(self, docs: Table, *, text_col: str = "text",
                 id_col: str = "doc_id", splitter=None):
        self._text_col = text_col
        self._id_col = id_col
        self._splitter = splitter or TokenCountSplitter(max_tokens=200, overlap=20)
        self._chunks = self._splitter(docs, text_col=text_col, id_col=id_col)

    @property
    def chunks(self) -> Table:
        """The split corpus: one row per chunk (chunk_pos, chunk_text)."""
        return self._chunks

    def register_mcp(self, server) -> None:
        """McpServable hookup (reference xpacks/llm/document_store.py:104):
        expose retrieve/statistics/inputs as MCP tools."""
        from ..schema import schema_from_types

        def _retrieve(queries: Table) -> Table:
            q = Table(queries._df.withColumn(
                "query_id", F.monotonically_increasing_id()))
            k_rows = queries._df.select("k").collect()
            k = int(k_rows[0]["k"] or 3) if k_rows else 3
            return self.retrieve(q, query_col="query", k=k)

        def _stats(_q: Table) -> Table:
            cdf = self._chunks._df
            return Table(cdf.agg(
                F.count(F.lit(1)).alias("chunk_count"),
                F.countDistinct(self._id_col).alias("doc_count"),
            ).withColumn(ID, F.lit(0).cast("long")))

        def _inputs(_q: Table) -> Table:
            docs = self._chunks._df.select(self._id_col).distinct()
            return Table(docs.withColumn(ID, F.col(self._id_col)))

        server.tool(name="retrieve_query", request_handler=_retrieve,
                    schema=schema_from_types(query=str, k=int),
                    description="top-k chunks for a text query")
        server.tool(name="statistics_query", request_handler=_stats,
                    schema=schema_from_types(),
                    description="chunk/document counts")
        server.tool(name="inputs_query", request_handler=_inputs,
                    schema=schema_from_types(),
                    description="indexed document ids")

    def retrieve(self, queries: Table, *, query_col: str = "query",
                 k: int = 3) -> Table:
        """BM25 top-k chunks per query: (query_id, doc_id, chunk_pos, rank)."""
        from ..indexing import tfidf_score

        scored = tfidf_score(
            Table(self._chunks._df.withColumn("__chunk_key", F.col(ID))),
            queries, text_col="chunk_text", id_col="__chunk_key",
            query_col=query_col, k=k,
        )
        back = self._chunks._df.select(
            F.col(ID).alias("__chunk_key"),
            F.col(self._id_col), F.col("chunk_pos"),
        )
        out = (
            scored._df.join(back, "__chunk_key")
            .select("query_id", self._id_col, "chunk_pos",
                    F.col("rank").cast("long").alias("rank"))
        )
        return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))
