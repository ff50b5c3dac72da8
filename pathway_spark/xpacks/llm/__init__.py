"""`pw.xpacks.llm` — the LLM tooling xpack (reference
`python/pathway/xpacks/llm/__init__.py`): document stores, embedders,
chats, parsers, splitters, rerankers, RAG question answering.

Everything composes the core engine's distributed operators; provider
SDKs and model weights are gated (offline deterministic variants exist
for every stage, so full pipelines run and test in-container)."""

from . import (
    embedders,
    llms,
    parsers,
    prompts,
    question_answering,
    rerankers,
    splitters,
    vector_store,
)
from ...ml.document_store import DocumentStore

__all__ = [
    "embedders", "llms", "parsers", "prompts", "question_answering",
    "rerankers", "splitters", "vector_store", "DocumentStore",
]
