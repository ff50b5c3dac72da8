"""VectorStore — reference `python/pathway/xpacks/llm/vector_store.py`.

`VectorStoreServer` in the reference is a live HTTP endpoint over a
continuously-maintained index. Here the index IS the table pipeline:
`VectorStore` embeds chunks once (lazy, cached DataFrame) and serves
`retrieve` as a KNN table op — the same composition the reference
performs, minus the HTTP transport (gated; any WSGI wrapper can expose
`.retrieve_dicts`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ...indexing import BruteForceKnnFactory
from ...table import ID, Table
from .embedders import BaseEmbedder, DeterministicHashEmbedder
from .splitters import TokenCountSplitter


class VectorStore:
    def __init__(self, docs: Table, *, embedder: BaseEmbedder | None = None,
                 splitter=None, text_col: str = "text",
                 id_col: str = "doc_id"):
        self._embedder = embedder or DeterministicHashEmbedder()
        self._splitter = splitter or TokenCountSplitter(max_tokens=200, overlap=20)
        self._id_col = id_col
        chunks = self._splitter(docs, text_col=text_col, id_col=id_col)
        embedded = chunks.with_columns(
            embedding=self._embedder(chunks["chunk_text"]))
        # embed once, reuse across every query batch
        embedded._df.persist()
        self._chunks = embedded
        self._knn = BruteForceKnnFactory(metric="cosine")

    @property
    def chunks(self) -> Table:
        return self._chunks

    def retrieve(self, queries: Table, *, query_col: str = "query",
                 k: int = 3) -> Table:
        """(query_id, doc_id, chunk_pos, rank) top-k by cosine."""
        q = queries.with_columns(
            __qvec=self._embedder(queries[query_col]))
        corpus = Table(self._chunks._df.select(
            F.col(ID).alias("vec_id"), F.col("embedding")))
        qt = Table(q._df.select(
            F.col(ID).alias("vec_id"), F.col("__qvec").alias("embedding")))
        # output: (query_id, neighbor_id, rank, score)
        hits = self._knn.query(corpus, qt, vec_col="embedding",
                               id_col="vec_id", k=k)
        back = self._chunks._df.select(
            F.col(ID).alias("neighbor_id"), F.col(self._id_col),
            F.col("chunk_pos"))
        out = hits._df.join(back, "neighbor_id").select(
            "query_id", self._id_col, "chunk_pos",
            F.col("rank").cast("long").alias("rank"))
        return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))

    def retrieve_dicts(self, query_strings: list[str], *, k: int = 3,
                       spark=None) -> list[list[dict]]:
        """Driver-convenience: list of per-query hit dicts (the shape the
        reference's HTTP endpoint returns)."""
        from ...session import get_spark

        spark = spark or get_spark()
        qdf = spark.createDataFrame(
            [(i, s) for i, s in enumerate(query_strings)], ["qid", "query"])
        qt = Table(qdf.withColumn(ID, F.col("qid")))
        hits = self.retrieve(qt, query_col="query", k=k)
        rows = hits._df.collect()
        out: list[list[dict]] = [[] for _ in query_strings]
        for r in rows:
            d = r.asDict()
            out[d["query_id"]].append(
                {k2: v for k2, v in d.items() if k2 != ID})
        for lst in out:
            lst.sort(key=lambda d: d["rank"])
        return out


class VectorStoreServer(VectorStore):
    """HTTP serving is transport, not engine — gated."""

    def run_server(self, host: str = "0.0.0.0", port: int = 8000, **_kw):
        raise NotImplementedError(
            "run_server requires an HTTP frontend (not part of the engine); "
            "wrap VectorStore.retrieve_dicts in any WSGI/ASGI app."
        )


class VectorStoreClient:
    def __init__(self, host: str, port: int, **_kw):
        raise NotImplementedError(
            "VectorStoreClient targets the reference's HTTP server; use "
            "VectorStore.retrieve / retrieve_dicts directly."
        )


__all__ = ["VectorStore", "VectorStoreServer", "VectorStoreClient"]
