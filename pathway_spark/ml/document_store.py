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
