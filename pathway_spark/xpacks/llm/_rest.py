"""Shared OpenAI-protocol REST transport (stdlib urllib, no SDK).

One retrying POST helper used by `OpenAICompatibleEmbedder` and
`OpenAICompatibleChat` so transport behavior (backoff set, network
error handling, auth header) cannot drift between the two."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

# 408/429 + every 5xx worth retrying, incl. 504 gateway timeouts
_RETRYABLE = {408, 429, 500, 502, 503, 504}


def openai_post(url: str, payload: dict, *, api_key: str | None,
                max_retries: int, timeout: float) -> dict:
    """POST JSON with bearer auth; retry retryable HTTP statuses AND
    network-level failures (URLError: refused/reset/DNS/socket timeout)
    with exponential backoff."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={
            "Content-Type": "application/json",
            **({"Authorization": f"Bearer {api_key}"} if api_key else {}),
        },
        method="POST",
    )
    delay = 0.5
    last: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as exc:
            if exc.code in _RETRYABLE and attempt < max_retries:
                last = exc
                time.sleep(delay)
                delay *= 2
                continue
            raise
        except urllib.error.URLError as exc:
            if attempt < max_retries:
                last = exc
                time.sleep(delay)
                delay *= 2
                continue
            raise
    raise RuntimeError(f"unreachable retry loop exit: {last}")
