"""Rerankers — reference `python/pathway/xpacks/llm/rerankers.py`.

`rerank_topk_filter` is a pure table op (window rank — no UDF, scales as
a single shuffle on query_id). `LLMReranker` scores (doc, query) pairs
with any injected chat UDF; the cross-/bi-encoder rerankers are gated on
their model packages.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ...table import ID, Table
from ...udfs import UDF
from .llms import BaseChat


def rerank_topk_filter(table: Table, *, score_col: str = "score",
                       group_col: str = "query_id", k: int = 3) -> Table:
    """Keep the k best-scored rows per group (reference rerankers.py:17).
    One window over (group, score) — no driver involvement."""
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).desc())
    df = (table._df.withColumn("__rk", F.row_number().over(w))
          .filter(F.col("__rk") <= k).drop("__rk"))
    return Table(df)


_PROMPT = (
    "Given a question and a document, rate how relevant the document is "
    "on a scale 1-5. Answer with ONLY the number.\n"
    "Question: {query}\nDocument: {doc}"
)


class LLMReranker:
    """reference rerankers.py:60 — ask a chat model for a 1-5 relevance
    score per (doc, query) pair. Any `BaseChat` works, including the
    offline EchoChat-style fakes (tests inject a deterministic scorer)."""

    def __init__(self, llm: BaseChat, *, prompt_template: str = _PROMPT):
        self._llm = llm
        self._template = prompt_template

    def __call__(self, table: Table, *, doc_col: str = "chunk_text",
                 query_col: str = "query") -> Table:
        chat_fn = self._llm._fn  # str prompt -> str completion
        tpl = self._template

        def score_fn(query: str, doc: str) -> float:
            return _parse_int_score(chat_fn(tpl.format(query=query, doc=doc)))

        scorer = UDF(score_fn, return_type=float)
        return table.with_columns(score=scorer(table[query_col], table[doc_col]))


def _parse_int_score(text: str) -> float:
    m = re.search(r"\d+", text or "")
    return float(m.group()) if m else 0.0


def _gated_reranker(pkg: str, cls: str):
    class _Gated(UDF):
        def __init__(self, *a, **kw):
            raise ImportError(
                f"{cls} requires the `{pkg}` package (not in this container); "
                f"use LLMReranker with an offline chat, or rerank_topk_filter "
                f"over retrieval scores."
            )

    _Gated.__name__ = cls
    return _Gated


CrossEncoderReranker = _gated_reranker("sentence_transformers", "CrossEncoderReranker")
EncoderReranker = _gated_reranker("sentence_transformers", "EncoderReranker")
FlashRankReranker = _gated_reranker("flashrank", "FlashRankReranker")


__all__ = [
    "rerank_topk_filter", "LLMReranker", "CrossEncoderReranker",
    "EncoderReranker", "FlashRankReranker",
]
