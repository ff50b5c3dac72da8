"""Embedders — reference `python/pathway/xpacks/llm/embedders.py`.

Every embedder is a `pw.UDF` whose column output is `array<float>` —
Arrow-batched pandas execution, so one Python crossing per batch and the
vectors land as a native Spark array column ready for the KNN/LSH
operators (`pathway_spark/indexing`, `operators/similarity.py`).

Provider-backed embedders (OpenAI/LiteLLM/SentenceTransformer/Gemini)
carry the real request structure but are gated on their client packages,
which aren't in this container. `DeterministicHashEmbedder` is the
offline stand-in: stable, unit-testable, shaped like the real thing.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable

import numpy as np

from ...udfs import UDF, AsyncRetryStrategy, CacheStrategy


class BaseEmbedder(UDF):
    """Subclasses set `self._fn` to a text→list[float] callable."""

    def __init__(self, fn: Callable, *, cache_strategy: CacheStrategy | None = None,
                 retry_strategy: AsyncRetryStrategy | None = None, **kw):
        if retry_strategy is not None and "executor" not in kw:
            # the UDF layer retries through its async executor — wire the
            # strategy in rather than silently dropping it
            from ...udfs import async_executor
            kw["executor"] = async_executor(retry_strategy=retry_strategy)
        super().__init__(fn, return_type="array<float>",
                         cache_strategy=cache_strategy, **kw)

    def get_embedding_dimension(self, **kwargs) -> int:
        probe = self._fn("pathway")
        return len(probe)


def _hash_embed(text: str, dimensions: int) -> list[float]:
    """Deterministic unit-norm embedding: token hashes scatter-add into a
    fixed-width vector (feature hashing). Pure python+numpy — runs
    identically on every executor with no model download."""
    vec = np.zeros(dimensions, dtype=np.float64)
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        idx = h % dimensions
        sign = 1.0 if (h >> 63) & 1 else -1.0
        vec[idx] += sign
    n = math.sqrt(float((vec * vec).sum()))
    if n > 0:
        vec /= n
    else:
        vec[0] = 1.0   # empty/whitespace text: deterministic unit vector,
                       # never all-zero (zero norms poison cosine downstream)
    return [float(x) for x in vec]


class DeterministicHashEmbedder(BaseEmbedder):
    """Offline feature-hashing embedder (testing / air-gapped default)."""

    def __init__(self, *, dimensions: int = 64, **kw):
        d = dimensions
        super().__init__(lambda text: _hash_embed(text, d), **kw)
        self.dimensions = dimensions

    def get_embedding_dimension(self, **kwargs) -> int:
        return self.dimensions


def _gated_embedder(pkg: str, cls: str):
    class _Gated(BaseEmbedder):
        def __init__(self, model: str | None = None, **kw):
            import importlib
            try:
                # import_module resolves dotted names to the LEAF module
                # (__import__("google.genai") returns `google`, which has
                # no Client) — reference clients are submodules
                mod = importlib.import_module(pkg)
            except ImportError as exc:
                raise ImportError(
                    f"{cls} requires the `{pkg}` package (not in this "
                    f"container); use DeterministicHashEmbedder for offline "
                    f"runs."
                ) from exc
            self._client_pkg = mod
            self._model = model

            def call(text: str) -> list[float]:
                return self._embed_one(text)

            super().__init__(call, **kw)

        def _embed_one(self, text: str) -> list[float]:  # pragma: no cover
            raise NotImplementedError

    _Gated.__name__ = cls
    return _Gated


class OpenAIEmbedder(_gated_embedder("openai", "OpenAIEmbedder")):
    """reference embedders.py:115 — `model` default text-embedding-3-small;
    per-batch async fan-out with retry/cache strategies."""

    def _embed_one(self, text: str) -> list[float]:  # pragma: no cover
        client = self._client_pkg.OpenAI()
        resp = client.embeddings.create(
            input=[text], model=self._model or "text-embedding-3-small")
        return list(resp.data[0].embedding)


class LiteLLMEmbedder(_gated_embedder("litellm", "LiteLLMEmbedder")):
    def _embed_one(self, text: str) -> list[float]:  # pragma: no cover
        resp = self._client_pkg.embedding(
            model=self._model or "text-embedding-3-small", input=[text])
        return list(resp["data"][0]["embedding"])


class SentenceTransformerEmbedder(
        _gated_embedder("sentence_transformers", "SentenceTransformerEmbedder")):
    def _embed_one(self, text: str) -> list[float]:  # pragma: no cover
        if not hasattr(self, "_st_model"):
            self._st_model = self._client_pkg.SentenceTransformer(
                self._model or "all-MiniLM-L6-v2")
        return [float(x) for x in self._st_model.encode(text)]


class GeminiEmbedder(_gated_embedder("google.genai", "GeminiEmbedder")):
    def _embed_one(self, text: str) -> list[float]:  # pragma: no cover
        client = self._client_pkg.Client()
        resp = client.models.embed_content(
            model=self._model or "text-embedding-004", contents=text)
        return list(resp.embeddings[0].values)


__all__ = [
    "BaseEmbedder", "DeterministicHashEmbedder", "OpenAICompatibleEmbedder",
    "OpenAIEmbedder",
    "LiteLLMEmbedder", "SentenceTransformerEmbedder", "GeminiEmbedder",
]


class OpenAICompatibleEmbedder(BaseEmbedder):
    """Embedder over the OpenAI-compatible REST protocol with NO client
    package: stdlib urllib against `base_url` (api.openai.com, or any
    compatible server — vLLM, Ollama, LiteLLM proxy...).  Reference
    `embedders.py:115` OpenAIEmbedder wraps the `openai` client; the
    wire protocol (`POST {base}/embeddings`, bearer auth, `{"model",
    "input"}` → `data[*].embedding`) is public and stable, so this
    path runs in containers without the SDK.  Retries retryable HTTP
    statuses (408/429/5xx) and network errors with backoff (_rest.py)."""

    def __init__(self, *, base_url: str, api_key: str | None = None,
                 model: str = "text-embedding-3-small",
                 max_retries: int = 3, timeout: float = 30.0, **kw):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.max_retries = max_retries
        self.timeout = timeout
        super().__init__(self._embed_one, **kw)

    def _embed_one(self, text: str) -> list[float]:
        from ._rest import openai_post

        resp = openai_post(
            f"{self.base_url}/embeddings",
            {"model": self.model, "input": [text]},
            api_key=self.api_key, max_retries=self.max_retries,
            timeout=self.timeout)
        return [float(x) for x in resp["data"][0]["embedding"]]
