"""RAG question answering — reference
`python/pathway/xpacks/llm/question_answering.py` (BaseRAGQuestionAnswerer).

The pipeline is a pure table composition: retrieve top-k chunks per
question (BM25/KNN join) → concat context per question (collect_list agg)
→ one chat-UDF call per question. Retrieval and context assembly stay
JVM-side; only the final model call crosses to Python, batch-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ...ml.document_store import DocumentStore
from ...table import ID, Table
from ...udfs import UDF
from .llms import BaseChat

_RAG_PROMPT = (
    "Use the context to answer the question.\n"
    "Context:\n{context}\n\nQuestion: {query}\nAnswer:"
)


class BaseRAGQuestionAnswerer:
    def __init__(self, llm: BaseChat, indexer: DocumentStore, *,
                 search_topk: int = 3, prompt_template: str = _RAG_PROMPT):
        self._llm = llm
        self._store = indexer
        self._k = search_topk
        self._template = prompt_template

    def answer_query(self, queries: Table, *, query_col: str = "query") -> Table:
        """(query_id, query, answer) — one row per input question."""
        if "query_id" not in queries._df.columns:
            queries = Table(queries._df.withColumn("query_id", F.col(ID)))
        hits = self._store.retrieve(queries, query_col=query_col, k=self._k)
        chunks = self._store.chunks._df.select(
            F.col(self._store._id_col), F.col("chunk_pos"),
            F.col("chunk_text"),
        )
        ctx = (hits._df
               .join(chunks, [self._store._id_col, "chunk_pos"])
               .groupBy("query_id")
               .agg(F.concat_ws("\n", F.collect_list("chunk_text"))
                     .alias("context")))
        qdf = queries._df.select(
            F.col(ID).alias("query_id"), F.col(query_col).alias("__q"))
        joined = Table(qdf.join(ctx, "query_id", "left")
                          .withColumn("context", F.coalesce("context", F.lit(""))))

        chat_fn = self._llm._fn
        tpl = self._template

        def ask(context: str, query: str) -> str:
            return chat_fn(tpl.format(context=context, query=query))

        asker = UDF(ask, return_type=str)
        out = joined.with_columns(answer=asker(joined["context"], joined["__q"]))
        return Table(out._df.select(
            "query_id", F.col("__q").alias("query"), "answer",
        ).withColumn(ID, F.col("query_id")))


class AdaptiveRAGQuestionAnswerer(BaseRAGQuestionAnswerer):
    """reference adaptive variant: start with a small k, re-ask with a
    larger context only for questions whose first answer signals "I don't
    know". Driver coordinates the (rare) second pass; both passes are the
    same distributed pipeline."""

    def __init__(self, llm: BaseChat, indexer: DocumentStore, *,
                 n_starting_documents: int = 2, factor: int = 2,
                 max_iterations: int = 2, **kw):
        super().__init__(llm, indexer, search_topk=n_starting_documents, **kw)
        self._factor = factor
        self._max_iterations = max_iterations

    def answer_query(self, queries: Table, *, query_col: str = "query") -> Table:
        answers = super().answer_query(queries, query_col=query_col)
        unknown = F.lower(F.col("answer")).contains("i don't know")
        for _ in range(self._max_iterations - 1):
            retry_df = answers._df.filter(unknown)
            if retry_df.isEmpty():
                break
            self._k *= self._factor
            retry_q = Table(
                retry_df.select(F.col("query").alias(query_col))
            )
            retried = super().answer_query(retry_q, query_col=query_col)
            answers = Table(
                answers._df.filter(~unknown).unionByName(retried._df)
            )
        return answers


__all__ = ["BaseRAGQuestionAnswerer", "AdaptiveRAGQuestionAnswerer"]
