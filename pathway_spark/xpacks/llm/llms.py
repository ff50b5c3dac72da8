"""Chat wrappers — reference `python/pathway/xpacks/llm/llms.py`.

`BaseChat` is a `pw.UDF` str(prompt-json)→str(completion). Provider chats
are gated on client packages; `EchoChat` is the deterministic offline
model used by tests and the RAG pipeline's default wiring checks.
"""

from __future__ import annotations

import json
from typing import Callable

from ...compat import Json
from ...udfs import UDF


def prompt_chat_single_qa(question: str) -> Json:
    """reference llms.py:1055 — wrap a question into the single-turn
    message format every chat accepts."""
    return Json([{"role": "user", "content": question}])


def _messages_of(prompt) -> list[dict]:
    if isinstance(prompt, Json):
        prompt = prompt.value
    if isinstance(prompt, str):
        try:
            parsed = json.loads(prompt)
            if isinstance(parsed, list):
                return parsed
        except (ValueError, TypeError):
            pass
        return [{"role": "user", "content": prompt}]
    return list(prompt)


class BaseChat(UDF):
    def __init__(self, fn: Callable, **kw):
        super().__init__(fn, return_type=str, **kw)


class EchoChat(BaseChat):
    """Offline deterministic chat: returns the last user message verbatim
    (prefixed) — keeps full RAG pipelines testable without a provider."""

    def __init__(self, prefix: str = "", **kw):
        def call(prompt: str) -> str:
            msgs = _messages_of(prompt)
            if not msgs:
                return prefix   # empty message list: empty completion,
                                # never an IndexError that kills the batch
            return prefix + msgs[-1]["content"]

        super().__init__(call, **kw)


def _gated_chat(pkg: str, cls: str):
    class _Gated(BaseChat):
        def __init__(self, *, model: str | None = None, **kw):
            try:
                __import__(pkg)
            except ImportError as exc:
                raise ImportError(
                    f"{cls} requires the `{pkg}` package; use EchoChat for "
                    f"offline runs."
                ) from exc
            self._pkg = __import__(pkg)
            self._model = model

            def call(prompt: str) -> str:
                return self._complete(_messages_of(prompt))

            super().__init__(call, **kw)

        def _complete(self, messages: list[dict]) -> str:  # pragma: no cover
            raise NotImplementedError

    _Gated.__name__ = cls
    return _Gated


class OpenAIChat(_gated_chat("openai", "OpenAIChat")):
    def _complete(self, messages):  # pragma: no cover
        client = self._pkg.OpenAI()
        r = client.chat.completions.create(
            model=self._model or "gpt-4o-mini", messages=messages)
        return r.choices[0].message.content


class LiteLLMChat(_gated_chat("litellm", "LiteLLMChat")):
    def _complete(self, messages):  # pragma: no cover
        r = self._pkg.completion(model=self._model, messages=messages)
        return r["choices"][0]["message"]["content"]


class CohereChat(_gated_chat("cohere", "CohereChat")):
    def _complete(self, messages):  # pragma: no cover
        client = self._pkg.Client()
        r = client.chat(message=messages[-1]["content"])
        return r.text


class HFPipelineChat(_gated_chat("transformers", "HFPipelineChat")):
    def _complete(self, messages):  # pragma: no cover
        if not hasattr(self, "_pipe"):
            self._pipe = self._pkg.pipeline("text-generation", model=self._model)
        return self._pipe(messages[-1]["content"])[0]["generated_text"]


__all__ = [
    "BaseChat", "EchoChat", "OpenAICompatibleChat", "OpenAIChat",
    "LiteLLMChat", "CohereChat", "HFPipelineChat", "prompt_chat_single_qa",
]


class OpenAICompatibleChat(BaseChat):
    """Chat over the OpenAI-compatible REST protocol with NO client
    package (stdlib urllib): `POST {base}/chat/completions`, bearer
    auth, `{"model", "messages", ...}` → `choices[0].message.content`.
    Works against api.openai.com or any compatible server (vLLM,
    Ollama, LiteLLM proxy).  Retries 5xx/429 with backoff; generation
    kwargs (temperature, max_tokens...) pass through the payload."""

    # UDF-layer options must never leak into the HTTP payload
    _UDF_OPTS = ("cache_strategy", "retry_strategy", "deterministic",
                 "executor")

    def __init__(self, *, base_url: str, api_key: str | None = None,
                 model: str = "gpt-4o-mini", max_retries: int = 3,
                 timeout: float = 60.0, **generation_kwargs):
        udf_kw = {k: generation_kwargs.pop(k) for k in self._UDF_OPTS
                  if k in generation_kwargs}
        rs = udf_kw.pop("retry_strategy", None)
        if rs is not None and "executor" not in udf_kw:
            from ...udfs import async_executor
            udf_kw["executor"] = async_executor(retry_strategy=rs)
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.max_retries = max_retries
        self.timeout = timeout
        self.generation_kwargs = generation_kwargs
        super().__init__(self._complete, **udf_kw)

    def _complete(self, prompt: str) -> str:
        from ._rest import openai_post

        msgs = _messages_of(prompt)
        if not msgs:
            return ""
        resp = openai_post(
            f"{self.base_url}/chat/completions",
            {"model": self.model, "messages": msgs,
             **self.generation_kwargs},
            api_key=self.api_key, max_retries=self.max_retries,
            timeout=self.timeout)
        return resp["choices"][0]["message"]["content"]
