"""Prompt templates — reference `python/pathway/xpacks/llm/prompts.py`."""

from __future__ import annotations

prompt_qa = (
    "Please provide an answer based solely on the provided sources. "
    "When referencing information from a source, cite the appropriate "
    "source(s).\nSources:\n{context}\nQuery: {query}\nAnswer:"
)

prompt_short_qa = (
    "Use the context to answer in as few words as possible. If the "
    "context does not contain the answer, say \"I don't know\".\n"
    "Context:\n{context}\nQuestion: {query}\nAnswer:"
)

prompt_citing_qa = (
    "Answer the question using the numbered sources; append the source "
    "numbers you used in square brackets.\nSources:\n{context}\n"
    "Question: {query}\nAnswer:"
)


def prompt_summarize(texts: list[str]) -> str:
    joined = "\n".join(texts)
    return f"Summarize the following texts into one concise summary:\n{joined}"


def prompt_query_rewrite(query: str) -> str:
    return (
        "Rewrite the following search query to be clearer and more "
        f"specific, keeping its meaning:\n{query}"
    )


__all__ = ["prompt_qa", "prompt_short_qa", "prompt_citing_qa",
           "prompt_summarize", "prompt_query_rewrite"]
