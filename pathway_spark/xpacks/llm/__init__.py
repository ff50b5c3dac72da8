"""`pw.xpacks.llm` — the LLM tooling xpack (reference
`python/pathway/xpacks/llm/__init__.py`): document stores, embedders,
chats, parsers, splitters, rerankers, RAG question answering.

Everything composes the core engine's distributed operators; provider
SDKs and model weights are gated (offline deterministic variants exist
for every stage, so full pipelines run and test in-container)."""

from typing import Callable, Iterable, TypeAlias, Union

from . import (
    embedders,
    llms,
    parsers,
    prompts,
    question_answering,
    rerankers,
    servers,
    splitters,
    vector_store,
)
from ...ml import document_store
from ...ml.document_store import DocumentStore
from .live_store import LiveDocumentStore

# reference `xpacks/llm/_typing.py`
Doc: TypeAlias = dict[str, "str | dict"]
DocTransformerCallable: TypeAlias = Union[
    Callable[[Iterable[Doc]], Iterable[Doc]],
    Callable[[Iterable[Doc], float], Iterable[Doc]],
]
DocTransformer: TypeAlias = Union[object, DocTransformerCallable]

__all__ = [
    "embedders", "llms", "parsers", "prompts", "question_answering",
    "rerankers", "servers", "splitters", "vector_store", "DocumentStore",
    "document_store", "Doc", "DocTransformer", "DocTransformerCallable",
    "LiveDocumentStore", "live_store",
]
