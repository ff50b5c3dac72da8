"""Vector-database sinks: pinecone / qdrant / milvus / weaviate / chroma.

Reference surface: `python/pathway/io/pinecone/__init__.py` (and the
Rust writer `src/connectors/data_storage/pinecone.rs`) — upsert streams
of (id, vector, metadata) into a vector index. Payload shapes follow the
services' PUBLIC REST APIs.

Scale design — unlike a single-endpoint REST sink, a vector-store
upsert fans out cleanly, so nothing is collected to the driver:

- batch: `df.foreachPartition` — every executor slice batches its own
  rows (`batch_size` per request) and POSTs them; N partitions upload
  in parallel, bounded memory per task.
- streaming: `writeStream.foreachBatch` drives the same per-partition
  path per micro-batch; delivery is at-least-once under retries (vector
  upserts are idempotent by id, so replays converge).
- retry: exponential backoff per request (`max_retries`), then raise —
  a failed task retries per Spark's task-retry policy, a failed
  micro-batch replays from the checkpoint.

Tests run the full path against a local ephemeral HTTP fixture
(tests/test_vector_sinks.py), asserting the exact request payloads.
"""

from __future__ import annotations

import json
import time
import urllib.request
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame

from ..table import ID, Table

Transport = Callable[[str, str, dict, bytes], int]


def _default_transport(url: str, method: str, headers: dict,
                       body: bytes) -> int:
    req = urllib.request.Request(url, data=body, method=method,
                                 headers=headers)
    with urllib.request.urlopen(req) as resp:
        return resp.status


def _post_with_retry(url: str, method: str, headers: dict, payload: Any, *,
                     max_retries: int, transport: Transport | None) -> None:
    send = transport or _default_transport
    body = json.dumps(payload, default=str).encode()
    hdrs = {"Content-Type": "application/json", **headers}
    delay = 0.2
    for attempt in range(max_retries + 1):
        try:
            send(url, method, hdrs, body)
            return
        except Exception:
            if attempt == max_retries:
                raise
            time.sleep(delay)
            delay = min(delay * 2, 5.0)


def _row_payloads(rows: Iterable, id_col: str, vector_col: str,
                  metadata_cols: list[str] | None):
    """(id, vector, metadata-dict) triples from Row objects."""
    for row in rows:
        d = row.asDict()
        vid = d[id_col]
        vec = [float(x) for x in d[vector_col]]
        if metadata_cols is None:
            meta = {k: v for k, v in d.items()
                    if k not in (id_col, vector_col, ID)}
        else:
            meta = {k: d.get(k) for k in metadata_cols}
        yield vid, vec, meta


def _write_partitioned(table: Table, send_batch, *, batch_size: int) -> None:
    """Run send_batch(list_of_rows) per `batch_size` rows, inside each
    partition (executor-side; no driver collect), batch and streaming."""

    def per_partition(rows):
        buf = []
        for row in rows:
            buf.append(row)
            if len(buf) >= batch_size:
                send_batch(buf)
                buf = []
        if buf:
            send_batch(buf)

    df = table.to_df()
    if df.isStreaming:
        return (
            df.writeStream
            .foreachBatch(lambda bdf, _bid: bdf.foreachPartition(per_partition))
            .start()
        )
    df.foreachPartition(per_partition)


# ------------------------------------------------------------------ pinecone

def pinecone_write(table: Table, *, api_key: str, index_host: str,
                   namespace: str = "", id_col: str = "id",
                   vector_col: str = "vector",
                   metadata_cols: list[str] | None = None,
                   batch_size: int = 100, max_retries: int = 3,
                   transport: Transport | None = None) -> None:
    """Upsert to a Pinecone index: POST {host}/vectors/upsert with
    {"vectors": [{"id", "values", "metadata"}], "namespace"}.
    Reference: python/pathway/io/pinecone/__init__.py."""
    url = index_host.rstrip("/") + "/vectors/upsert"
    headers = {"Api-Key": api_key}

    def send_batch(rows):
        vectors = [
            {"id": str(vid), "values": vec, "metadata": meta}
            for vid, vec, meta in _row_payloads(rows, id_col, vector_col,
                                                metadata_cols)
        ]
        payload = {"vectors": vectors}
        if namespace:
            payload["namespace"] = namespace
        _post_with_retry(url, "POST", headers, payload,
                         max_retries=max_retries, transport=transport)

    return _write_partitioned(table, send_batch, batch_size=batch_size)


# ------------------------------------------------------------------ qdrant

def qdrant_write(table: Table, *, url: str, collection: str,
                 api_key: str | None = None, id_col: str = "id",
                 vector_col: str = "vector",
                 metadata_cols: list[str] | None = None,
                 batch_size: int = 100, max_retries: int = 3,
                 transport: Transport | None = None) -> None:
    """Upsert points: PUT {url}/collections/{c}/points?wait=true with
    {"points": [{"id", "vector", "payload"}]}."""
    endpoint = f"{url.rstrip('/')}/collections/{collection}/points?wait=true"
    headers = {"api-key": api_key} if api_key else {}

    def send_batch(rows):
        points = [
            {"id": vid if isinstance(vid, int) else str(vid),
             "vector": vec, "payload": meta}
            for vid, vec, meta in _row_payloads(rows, id_col, vector_col,
                                                metadata_cols)
        ]
        _post_with_retry(endpoint, "PUT", headers, {"points": points},
                         max_retries=max_retries, transport=transport)

    return _write_partitioned(table, send_batch, batch_size=batch_size)


# ------------------------------------------------------------------ milvus

def milvus_write(table: Table, *, url: str, collection: str,
                 token: str | None = None, id_col: str = "id",
                 vector_col: str = "vector",
                 metadata_cols: list[str] | None = None,
                 batch_size: int = 100, max_retries: int = 3,
                 transport: Transport | None = None) -> None:
    """Insert entities: POST {url}/v2/vectordb/entities/insert with
    {"collectionName", "data": [{id, vector, ...metadata}]}."""
    endpoint = url.rstrip("/") + "/v2/vectordb/entities/insert"
    headers = {"Authorization": f"Bearer {token}"} if token else {}

    def send_batch(rows):
        data = [
            {"id": vid, "vector": vec, **meta}
            for vid, vec, meta in _row_payloads(rows, id_col, vector_col,
                                                metadata_cols)
        ]
        _post_with_retry(endpoint, "POST", headers,
                         {"collectionName": collection, "data": data},
                         max_retries=max_retries, transport=transport)

    return _write_partitioned(table, send_batch, batch_size=batch_size)


# ------------------------------------------------------------------ weaviate

def weaviate_write(table: Table, *, url: str, class_name: str,
                   api_key: str | None = None, id_col: str = "id",
                   vector_col: str = "vector",
                   metadata_cols: list[str] | None = None,
                   batch_size: int = 100, max_retries: int = 3,
                   transport: Transport | None = None) -> None:
    """Batch objects: POST {url}/v1/batch/objects with
    {"objects": [{"class", "properties", "vector"}]} — the row id rides
    in properties (Weaviate object ids must be UUIDs)."""
    endpoint = url.rstrip("/") + "/v1/batch/objects"
    headers = {"Authorization": f"Bearer {api_key}"} if api_key else {}

    def send_batch(rows):
        objects = [
            {"class": class_name,
             "properties": {**meta, id_col: vid},
             "vector": vec}
            for vid, vec, meta in _row_payloads(rows, id_col, vector_col,
                                                metadata_cols)
        ]
        _post_with_retry(endpoint, "POST", headers, {"objects": objects},
                         max_retries=max_retries, transport=transport)

    return _write_partitioned(table, send_batch, batch_size=batch_size)


# ------------------------------------------------------------------ chroma

def chroma_write(table: Table, *, url: str, collection_id: str,
                 id_col: str = "id", vector_col: str = "vector",
                 document_col: str | None = None,
                 metadata_cols: list[str] | None = None,
                 batch_size: int = 100, max_retries: int = 3,
                 transport: Transport | None = None) -> None:
    """Upsert: POST {url}/api/v1/collections/{id}/upsert with columnar
    {"ids", "embeddings", "metadatas", "documents"}."""
    endpoint = f"{url.rstrip('/')}/api/v1/collections/{collection_id}/upsert"

    def send_batch(rows):
        ids, embs, metas, docs = [], [], [], []
        for row in rows:
            d = row.asDict()
            ids.append(str(d[id_col]))
            embs.append([float(x) for x in d[vector_col]])
            doc = d.get(document_col) if document_col else None
            docs.append(doc)
            skip = {id_col, vector_col, ID, document_col}
            if metadata_cols is None:
                metas.append({k: v for k, v in d.items() if k not in skip})
            else:
                metas.append({k: d.get(k) for k in metadata_cols})
        payload = {"ids": ids, "embeddings": embs, "metadatas": metas}
        if document_col:
            payload["documents"] = docs
        _post_with_retry(endpoint, "POST", {}, payload,
                        max_retries=max_retries, transport=transport)

    return _write_partitioned(table, send_batch, batch_size=batch_size)


def leann_write(table: Table, *, index_path: str, text_col: str = "text",
                metadata_cols: list[str] | None = None,
                backend_name: str = "hnsw",
                embedding_mode: str | None = None,
                embedding_model: str | None = None,
                embedding_options: dict | None = None,
                builder_factory=None) -> int:
    """LEANN local-index sink (reference python/pathway/io/leann
    `_LeannObserver`): accumulate (text, metadata) rows, skip empty
    text, build the index once at the end of input.

    ``builder_factory(**kwargs)`` must return an object with
    ``add_text(text=..., metadata=...)`` and ``build_index(path)``; by
    default the `leann` package's LeannBuilder is used (gated — not in
    this container). Driver-side by contract, like the reference: LEANN
    builds a single local index file. Returns the number of docs indexed.
    """
    if builder_factory is None:
        try:
            from leann import LeannBuilder as builder_factory  # noqa: N813
        except ImportError as e:
            raise NotImplementedError(
                "io.leann.write requires the `leann` package; pass "
                "builder_factory= to use another index builder.") from e

    import os

    docs: list[dict] = []
    for row in table.to_df().toLocalIterator():
        d = row.asDict()
        text = d.get(text_col)
        if not text or not str(text).strip():
            continue
        meta = {c: d.get(c) for c in (metadata_cols or [])}
        docs.append({"text": text, "metadata": meta})
    if not docs:
        return 0
    kwargs: dict = {"backend_name": backend_name}
    if embedding_mode:
        kwargs["embedding_mode"] = embedding_mode
    if embedding_model:
        kwargs["embedding_model"] = embedding_model
    if embedding_options:
        kwargs["embedding_options"] = embedding_options
    builder = builder_factory(**kwargs)
    for doc in docs:
        builder.add_text(**doc)
    os.makedirs(os.path.dirname(os.path.abspath(index_path)), exist_ok=True)
    builder.build_index(str(index_path))
    return len(docs)
